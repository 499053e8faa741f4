"""Gradient and train-trajectory parity vs the torch reference oracle.

This converts "forward parity" into "training parity": with identical
converted weights and an identical batch, d(total_loss)/d(params) of the
composed model + loss stack must match torch autograd through the reference
(models/RITnet_v2.py:372-432, driven by train.py:286-287), and N
identical-data plain-SGD train steps must produce the same loss sequence
(SGD rather than Adam so epsilon conventions can't mask a divergence).

Both sides run in float64 on CPU so agreement is limited by the math —
``where``-grad vs branch-grad conventions in the masked losses
(loss.py:48-84), the seg2pt 0/0 path (RITnet_v2.py:392-408), seg_detach
stop-gradients, and train-mode BatchNorm statistics — not by accumulation
order. The gradient mapping torch->flax reuses the checkpoint converter on
the .grad tensors themselves (gradients transform exactly like weights
under layout transposition).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.config import VARIANT_PRESETS
from eghmd_tpu.losses import compute_all_losses
from eghmd_tpu.models import ESFNet
from eghmd_tpu.utils.torch_convert import esfnet_torch_to_flax

from reference_oracle import import_reference

# 240x320 is the smallest size the torch oracle supports (its regression
# head hardcodes a 32*3*5 flatten, utils.py:1007 — only bottleneck 15x20
# reaches it); B=1 keeps the f64 CPU cost tolerable.
B, H, W = 1, 240, 320
ALPHA = 0.5


@pytest.fixture(scope="module", autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


def _reference_setting(cfg):
    return {k: getattr(cfg, k) for k in (
        "add_seg", "seg_detach", "add_edge", "edge_thres", "add_selayer",
        "generate_eyeball", "feature_channels", "style_dim", "input_concat",
        "only_edge")}


def _make_batch(seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(B, 1, H, W).astype(np.float64)
    edge = rng.rand(B, 1, H, W).astype(np.float64)
    target = rng.randint(0, 3, (B, H, W)).astype(np.int64)
    # all classes present per sample (reference wCE ignore_index no-op)
    target[:, 0, 0], target[:, 0, 1], target[:, 0, 2] = 0, 1, 2
    spat = (1 + 20 * rng.rand(B, H, W)).astype(np.float64)
    dist = rng.randn(B, 3, H, W).astype(np.float64)
    pupil_center = rng.uniform(10, 200, (B, 2)).astype(np.float64)
    el_norm = rng.uniform(-0.5, 0.5, (B, 2, 5)).astype(np.float64)
    el_norm[:, :, 2:4] = rng.uniform(0.2, 0.6, (B, 2, 2))
    cond = np.zeros((B, 4), np.float64)
    return dict(img=img, edge=edge, target=target, spat=spat, dist=dist,
                pupil_center=pupil_center, el_norm=el_norm, cond=cond)


def _torch_model(variant, seed=7):
    import torch

    ref_mod = import_reference("models.RITnet_v2")
    torch.manual_seed(seed)
    model = ref_mod.DenseNet2D(_reference_setting(variant)).double()
    model.train()
    return model


def _torch_forward(model, b):
    import torch

    t = {k: torch.from_numpy(v) for k, v in b.items()}
    op, el_pred, latent, loss, el_out = model(
        t["img"], t["edge"], t["target"], t["pupil_center"], t["el_norm"],
        t["spat"], t["dist"], t["cond"],
        torch.zeros(B, dtype=torch.long), ALPHA)
    return loss


def _torch_loss_and_grads(variant, b):
    model = _torch_model(variant)
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    loss = _torch_forward(model, b)
    loss.backward()
    grad_sd = {}
    named = dict(model.named_parameters())
    for k, v in model.state_dict().items():
        if k in named:
            g = named[k].grad
            grad_sd[k] = (np.zeros(v.shape) if g is None else g.numpy().copy())
        else:  # BN running stats / counters: placeholder for the converter
            grad_sd[k] = np.zeros(v.shape)
    return sd, float(loss.detach()), grad_sd


def _jax_loss_fn(model, b):
    batch = dict(
        image=jnp.asarray(np.transpose(b["img"], (0, 2, 3, 1))),
        edge=jnp.asarray(np.transpose(b["edge"], (0, 2, 3, 1))),
        target=jnp.asarray(b["target"].astype(np.int32)),
        spat_weights=jnp.asarray(b["spat"]),
        dist_map=jnp.asarray(np.transpose(b["dist"], (0, 2, 3, 1))),
        pupil_center=jnp.asarray(b["pupil_center"]),
        el_norm=jnp.asarray(b["el_norm"]),
        cond=jnp.asarray(b["cond"]),
    )

    def loss_fn(params, batch_stats):
        (op, el_out, _), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], batch["edge"], train=True,
            mutable=["batch_stats"])
        out = compute_all_losses(
            op, el_out, batch["target"], batch["pupil_center"],
            batch["el_norm"], batch["spat_weights"], batch["dist_map"],
            batch["cond"], ALPHA)
        return out.total, mut["batch_stats"]

    return loss_fn


def _leaf_paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


# All f64 torch-parity gradient tests are slow-marked: 4-15 min each on
# this 1-core box, and the cost is f64 EXECUTION (the compile cache can't
# help), which alone blew the fast suite past its wall-time budget
# (VERDICT r2 #9). The fast suite's train-step numeric guard is the
# golden-trajectory family (tests/test_training.py) — any gradient
# regression moves those pinned loss sequences — and the torch-parity
# evidence is re-established once per round via the slow suite
# (SLOW_SUITE_r*.txt records the outcome, VERDICT r2 #8).
@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "baseline",
    "baseline_edge",
    "baseline_adain_edge",
])
def test_gradient_parity(name):
    variant = VARIANT_PRESETS[name]
    b = _make_batch(seed=3)
    sd, ref_loss, grad_sd = _torch_loss_and_grads(variant, b)

    variables = jax.tree.map(jnp.asarray, esfnet_torch_to_flax(sd, variant))
    model = ESFNet(setting=variant, dtype=jnp.float64)
    loss_fn = _jax_loss_fn(model, b)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"], variables["batch_stats"])

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-8)

    ref_grads = _leaf_paths(
        esfnet_torch_to_flax(grad_sd, variant)["params"])
    our_grads = _leaf_paths(grads)
    assert set(ref_grads) == set(our_grads)
    for path, rg in ref_grads.items():
        og = our_grads[path]
        scale = np.abs(rg).max()
        np.testing.assert_allclose(
            og, rg, rtol=1e-5, atol=1e-8 * max(scale, 1.0),
            err_msg=f"gradient mismatch at {path} ({name})")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["baseline", "baseline_edge"])
def test_sgd_trajectory_parity(name):
    """N identical-data plain-SGD steps: the loss sequences must agree.

    Covers what single-step gradient parity cannot: train-mode BatchNorm
    running-stat updates feeding later steps, and compounding of any
    small systematic gradient bias.
    """
    import torch

    variant = VARIANT_PRESETS[name]
    lr = 1e-6  # keep iterates in a numerically tame region at random init
    n_steps = 3
    batches = [_make_batch(seed=s) for s in (3, 4)]

    model_t = _torch_model(variant)
    sd0 = {k: v.detach().clone() for k, v in model_t.state_dict().items()}
    opt = torch.optim.SGD(model_t.parameters(), lr=lr)
    ref_losses = []
    for i in range(n_steps):
        opt.zero_grad()
        loss = _torch_forward(model_t, batches[i % 2])
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    variables = jax.tree.map(jnp.asarray, esfnet_torch_to_flax(sd0, variant))
    model = ESFNet(setting=variant, dtype=jnp.float64)
    params, stats = variables["params"], variables["batch_stats"]
    loss_fns = [_jax_loss_fn(model, b) for b in batches]
    our_losses = []
    for i in range(n_steps):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fns[i % 2], has_aux=True)(params, stats)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        stats = new_stats
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-7,
                               err_msg=f"trajectory diverged ({name})")
