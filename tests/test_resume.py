"""Resume / pretrained-bootstrap through the train driver.

A killed-and-resumed synthetic run must reproduce the uninterrupted run's
metric trajectory (reference resume semantics, train.py:151-160; bootstrap
train.py:162-172).
"""

import numpy as np
import pytest

from cli.train import main as train_main


def run(tmp, expname, epochs, resume=0, loadfile=""):
    argv = [
        "--synthetic", "16", "--epochs", str(epochs), "--batchsize", "8",
        "--image_height", "176", "--image_width", "192",
        "--setting", "baseline", "--disentangle", "0", "--workers", "2",
        "--expname", expname, "--log_dir", str(tmp), "--resume", str(resume),
    ]
    if loadfile:
        argv += ["--loadfile", loadfile]
    return train_main(argv)


@pytest.mark.slow
def test_resume_reproduces_trajectory(tmp_path, monkeypatch):
    full = run(tmp_path, "full", epochs=3)

    # "kill" the second run at the start of epoch 2 (a plain shorter
    # --epochs would NOT reproduce the full run: the alpha ramp depends on
    # the total epoch count), then resume it.
    from eghmd_tpu.training.trainer import Trainer

    orig = Trainer.run_epoch

    def dying(self, state, pipeline, epoch):
        if epoch == 2:
            raise KeyboardInterrupt("simulated preemption")
        return orig(self, state, pipeline, epoch)

    monkeypatch.setattr(Trainer, "run_epoch", dying)
    with pytest.raises(KeyboardInterrupt):
        run(tmp_path, "resumed", epochs=3)
    monkeypatch.setattr(Trainer, "run_epoch", orig)

    resumed = run(tmp_path, "resumed", epochs=3, resume=1)
    assert [h["epoch"] for h in resumed] == [2]
    full_e2 = full[2]
    res_e2 = resumed[0]
    np.testing.assert_allclose(res_e2["stop_metric"], full_e2["stop_metric"],
                               rtol=1e-4)
    np.testing.assert_allclose(res_e2["train"]["loss"], full_e2["train"]["loss"],
                               rtol=1e-4)


@pytest.mark.slow
def test_bootstrap_from_checkpoint(tmp_path):
    run(tmp_path, "donor", epochs=1)
    donor_ck = str(tmp_path / "ritnet_v2" / "donor" / "checkpoints")
    hist = run(tmp_path, "boot", epochs=1, loadfile=donor_ck)
    assert len(hist) == 1 and np.isfinite(hist[0]["train"]["loss"])


@pytest.mark.slow  # compiles two model inits + an orbax round-trip
def test_partial_bootstrap_state_fast_input(tmp_path):
    """--init_ckpt semantics (cli/distill.py): an input_downscale student
    bootstraps from a full-resolution student's checkpoint — every conv/BN
    leaf transfers, only the regression-head flatten (whose width depends
    on the bottleneck geometry, reference utils.py:1007) stays fresh."""
    import jax.numpy as jnp

    from eghmd_tpu.config import ExperimentConfig, VARIANT_PRESETS
    from eghmd_tpu.models import build_model
    from eghmd_tpu.training.checkpoints import (CheckpointManager,
                                                partial_bootstrap_state)
    from eghmd_tpu.training.trainer import Trainer

    # 240x320: the fast-input (in/2) regression head needs the serving
    # geometry (at 176x192 in/2 the post-c1 map drops below 5x5)
    H, W = 240, 320
    cfg = ExperimentConfig(setting="baseline", epochs=1, batchsize=2,
                           image_size=(H, W))
    batch = {
        "image": jnp.zeros((2, H, W, 1)),
        "edge": jnp.zeros((2, H, W, 1)),
        "target": jnp.zeros((2, H, W), jnp.int32),
        "spat_weights": jnp.ones((2, H, W)),
        "dist_map": jnp.zeros((2, H, W, 3)),
        "pupil_center": jnp.zeros((2, 2)),
        "el_norm": jnp.zeros((2, 2, 5)),
        "cond": jnp.zeros((2, 4)),
    }
    variant = VARIANT_PRESETS["baseline"]
    full = Trainer(cfg, build_model("ritnet_v2", variant))
    src_state = full.init_state(batch)
    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.save(0, src_state, is_best=True)

    fast = Trainer(cfg, build_model("ritnet_v2", variant, input_downscale=2))
    dst_state = fast.init_state(batch)
    boot, copied, total = partial_bootstrap_state(dst_state, str(tmp_path / "ck"))
    assert copied < total  # the flatten-width leaves can't transfer
    assert copied >= total - 2  # ...but everything else does (l1 kernel)
    np.testing.assert_array_equal(
        np.asarray(boot.params["enc"]["head"]["conv1"]["kernel"]),
        np.asarray(src_state.params["enc"]["head"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(boot.params["elReg"]["l1"]["kernel"]),
        np.asarray(dst_state.params["elReg"]["l1"]["kernel"]))


@pytest.mark.slow  # compiles two model inits on the 1-CPU mesh
def test_partial_weight_loading_across_variants():
    """Reference pytorchtools.py:85-101 semantics: matching-path+shape
    leaves transfer, the rest stay freshly initialized."""
    import jax
    import jax.numpy as jnp

    from eghmd_tpu.config import VARIANT_PRESETS
    from eghmd_tpu.models import ESFNet
    from eghmd_tpu.training.checkpoints import partial_weight_loading

    x = jnp.zeros((1, 176, 192, 1))
    src_m = ESFNet(setting=VARIANT_PRESETS["baseline"])
    dst_m = ESFNet(setting=VARIANT_PRESETS["baseline_edge"])
    src = jax.jit(lambda r: src_m.init(r, x, x, train=False))(jax.random.PRNGKey(0))
    dst = jax.jit(lambda r: dst_m.init(r, x, x, train=False))(jax.random.PRNGKey(1))

    merged, copied, total = partial_weight_loading(src["params"], dst["params"])
    assert 0 < copied < total  # encoder transfers; wider decoder/regressor don't
    # a transferred leaf equals the source...
    np.testing.assert_array_equal(
        np.asarray(merged["enc"]["head"]["conv1"]["kernel"]),
        np.asarray(src["params"]["enc"]["head"]["conv1"]["kernel"]))
    # ...and a shape-mismatched leaf keeps the destination init
    k = "up_block4"
    np.testing.assert_array_equal(
        np.asarray(merged["dec"][k]["conv11"]["kernel"]),
        np.asarray(dst["params"]["dec"][k]["conv11"]["kernel"]))
