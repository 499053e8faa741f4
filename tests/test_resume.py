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
