"""Full eval-driver COMPOSITION parity vs the reference test driver.

Per-component parity exists elsewhere (model forwards in
test_esfnet_parity.py, metric math + aggregation scheme in test_metrics.py);
this module closes the composition gap: the reference's actual ``calc_acc``
(reference test.py:31-252 — forward, argmax, sklearn IoU, latent/seg center
distances, two-level nanmean aggregation) is DRIVEN END-TO-END on converted
weights and compared against ``inference.Evaluator.run`` on the identical
samples, batching, and weights. Any drift anywhere in either eval stack —
prediction path, cond masking, unnormalization, batch aggregation — breaks
the 5 returned aggregates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import import_reference

from eghmd_tpu.config import VARIANT_PRESETS
from eghmd_tpu.data import DataPipeline, SyntheticEyeDataset
from eghmd_tpu.inference import Evaluator
from eghmd_tpu.models.esfnet import ESFNet

SIZE = (240, 320)  # the reference regression head's FC dims are hardcoded
# for this size (utils.py:1016-1019), so converted weights only load there
N, BATCH = 8, 4


def _torch_batches(samples, batch):
    """Collate our Samples into the reference loader's 9-tuple batches
    (reference CurriculumLib.py:94-166 output order, NCHW)."""
    import torch

    out = []
    for i in range(0, len(samples), batch):
        chunk = samples[i: i + batch]
        img = torch.from_numpy(
            np.stack([s.image for s in chunk]).transpose(0, 3, 1, 2)).float()
        labels = torch.from_numpy(
            np.stack([s.target for s in chunk])).long()
        spat = torch.from_numpy(
            np.stack([s.spat_weights for s in chunk])).float()
        dist = torch.from_numpy(
            np.stack([s.dist_map for s in chunk]).transpose(0, 3, 1, 2)).float()
        pup_c = torch.from_numpy(np.stack([s.pupil_center for s in chunk])).float()
        iri_c = torch.from_numpy(np.stack([s.iris_center for s in chunk])).float()
        el_norm = torch.from_numpy(np.stack([s.el_norm for s in chunk])).float()
        cond = torch.from_numpy(np.stack([s.cond for s in chunk])).float()
        im_info = torch.from_numpy(np.stack([s.im_info for s in chunk])).long()
        out.append((img, labels, spat, dist, pup_c, iri_c, el_norm, cond,
                    im_info))
    return out


def test_calc_acc_composition_parity():
    import torch

    from eghmd_tpu.utils.torch_convert import esfnet_flax_to_torch
    from test_esfnet_parity import _reference_setting

    # reference test.py bumps RLIMIT_NOFILE at import (test.py:27-28);
    # this sandbox's hard limit is lower — no-op it for the import only
    import resource

    orig_setrlimit = resource.setrlimit
    resource.setrlimit = lambda *a, **k: None
    try:
        ref_test = import_reference("test")
    finally:
        resource.setrlimit = orig_setrlimit
    ref_mod = import_reference("models.RITnet_v2")

    variant = VARIANT_PRESETS["baseline"]  # edge input unused -> both
    # drivers see equivalent inputs regardless of their edge sources

    # ragged cond: some samples carry no mask annotations, so the
    # batch-level nanmean aggregation actually matters
    ds = SyntheticEyeDataset(N, SIZE, seed=0, missing_mask_frac=0.3)
    samples = [ds[i] for i in range(N)]
    conds = np.stack([s.cond for s in samples])
    assert conds[:, 1].sum() > 0, "fixture should include missing-mask samples"
    assert (1 - conds[:, 1]).sum() > 0

    # one set of weights for both drivers
    model = ESFNet(setting=variant)
    x0 = jnp.zeros((1, *SIZE, 1), jnp.float32)
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(11), x0, x0)

    tmodel = ref_mod.DenseNet2D(_reference_setting(variant))
    sd = esfnet_flax_to_torch(variables, variant)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected

    class _EdgeStub(torch.nn.Module):
        """Stands in for the frozen BDCN: calc_acc only consumes the last
        (fuse) output (reference utils.py:649); zeros match the Evaluator's
        edge input for an edge-free variant."""

        def forward(self, x):
            return [torch.zeros_like(x[:, :1])]

    class _Args:
        model = "ritnet_v2"
        prec = torch.float32
        test_normal = False
        disp = 0
        record_iou = 0
        edge_thres = 0

    ref = ref_test.calc_acc(_Args(), _torch_batches(samples, BATCH), tmodel,
                            _EdgeStub(), torch.device("cpu"), return_all=True)
    ref_ious, ref_pup_lat, ref_iri_lat, ref_pup_seg, ref_iri_seg = ref

    # our driver on the same samples, same order, same batching
    ev = Evaluator(model, variables, edge_fn=None)
    ours = ev.run(DataPipeline(ds, batch_size=BATCH, shuffle=False,
                               num_workers=2, drop_last=True))

    np.testing.assert_allclose(ours["ious"], ref_ious, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours["mean_iou"], np.mean(ref_ious), rtol=2e-4)
    for key, ref_val in (("pup_lat_dist", ref_pup_lat),
                         ("iri_lat_dist", ref_iri_lat),
                         ("pup_seg_dist", ref_pup_seg),
                         ("iri_seg_dist", ref_iri_seg)):
        assert ours[key] == pytest.approx(float(ref_val), rel=2e-3, abs=1e-3), key


def test_calc_acc_deepvog_path_parity():
    """calc_acc's divergent deepvog branch (test.py:66-69,90-93,157-158:
    pupil-binary label remap, elOut <- elPred, latent/iris metrics skipped)
    vs Evaluator(pupil_only=True) on converted weights. The comparable
    aggregates are the bg/pupil IoUs and the seg pupil distance (the
    reference's own 3-class mean is NaN here since binary labels leave
    class 2 permanently absent)."""
    import torch

    from eghmd_tpu.models import DeepVOG
    from eghmd_tpu.utils.torch_convert import deepvog_torch_to_flax

    import resource

    orig_setrlimit = resource.setrlimit
    resource.setrlimit = lambda *a, **k: None
    try:
        ref_test = import_reference("test")
    finally:
        resource.setrlimit = orig_setrlimit
    ref_dv = import_reference("models.deepvog_pytorch")

    n, batch = 4, 2
    ds = SyntheticEyeDataset(n, SIZE, seed=0, missing_mask_frac=0.3)
    samples = [ds[i] for i in range(n)]

    torch.manual_seed(5)
    tmodel = ref_dv.DeepVOG_pytorch()
    variables = jax.tree.map(jnp.asarray,
                             deepvog_torch_to_flax(tmodel.state_dict()))
    model = DeepVOG()

    class _EdgeStub(torch.nn.Module):
        def forward(self, x):
            return [torch.zeros_like(x[:, :1])]

    class _Args:
        model = "deepvog"
        prec = torch.float32
        test_normal = False
        disp = 0
        record_iou = 0
        edge_thres = 0

    ref_miou, ref_pup_seg, _ = ref_test.calc_acc(
        _Args(), _torch_batches(samples, batch), tmodel, _EdgeStub(),
        torch.device("cpu"))

    ev = Evaluator(model, variables, edge_fn=None, pupil_only=True)
    ours = ev.run(DataPipeline(ds, batch_size=batch, shuffle=False,
                               num_workers=2, drop_last=True))

    # the reference returns np.mean over a per-class vector whose iris slot
    # is permanently NaN under binary labels — its deepvog "mIoU" is NaN by
    # construction (test.py:249-250), and ours reproduces that quirk
    assert np.isnan(ref_miou) and np.isnan(ours["mean_iou"])
    assert np.all(np.isfinite(ours["ious"][:2]))  # bg/pupil IoUs are real
    assert ours["pup_seg_dist"] == pytest.approx(float(ref_pup_seg),
                                                 rel=2e-3, abs=1e-3)
