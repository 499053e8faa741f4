"""Distillation subsystem tests (training/distill.py).

A width-scaled student (the serving-throughput lever — BASELINE.md roofline)
is trained to reproduce a teacher; acceptance is gated on student-vs-teacher
segmentation agreement plus GT mIoU drop.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.config import (ExperimentConfig, VARIANT_PRESETS,
                              scaled_variant)
from eghmd_tpu.data import SyntheticEyeDataset, DataPipeline
from eghmd_tpu.models import build_model
from eghmd_tpu.parallel import batch_sharding
from eghmd_tpu.training import (DistillConfig, DistillTrainer, distill_gate,
                                evaluate_fidelity)

SIZE = (176, 192)  # min input for the regression head


def test_scaled_variant_bottleneck():
    v = scaled_variant(VARIANT_PRESETS["baseline_input_concat"], 16, 1.2)
    assert v.feature_channels == int(1.2 * 16 * 4)
    assert v.input_concat == 1
    # the flagship stays at the reference's 153
    assert VARIANT_PRESETS["baseline_edge"].feature_channels == 153


def test_gate_logic():
    ok = {"miou_drop": 0.01, "agreement_miou": 0.95}
    assert distill_gate(ok)
    assert not distill_gate({"miou_drop": 0.05, "agreement_miou": 0.95})
    assert not distill_gate({"miou_drop": 0.01, "agreement_miou": 0.5})


def test_gate_center_criteria():
    """VERDICT r3 #2: the gate must bound the CENTER output, not just mIoU —
    round-3 gates accepted students at 2.6x the teacher's center error."""
    base = {"miou_drop": 0.01, "agreement_miou": 0.95,
            "student_pup_c_seg": 4.0, "teacher_pup_c_seg": 3.0}
    assert distill_gate(base)  # within teacher + 2 px
    bad_val = dict(base, student_pup_c_seg=5.5)
    assert not distill_gate(bad_val)
    assert distill_gate(bad_val, max_center_excess_px=3.0)  # bound is a knob

    # the real-clip median criterion applies only when its metric exists
    real_ok = dict(base, real_pup_c_delta_p50=6.0)
    real_bad = dict(base, real_pup_c_delta_p50=9.5)
    assert distill_gate(real_ok)
    assert not distill_gate(real_bad)

    # NaN / missing center metrics skip the criterion (tiny smoke runs can
    # have no valid center annotations) rather than crash or auto-fail
    assert distill_gate(dict(base, student_pup_c_seg=float("nan")))

    # criteria_out records per-criterion verdicts + bounds for gate.json
    crit = {}
    assert not distill_gate(dict(base, real_pup_c_delta_p50=9.5),
                            criteria_out=crit)
    assert crit["miou_drop_ok"] and crit["center_val_ok"]
    assert not crit["center_real_p50_ok"]
    assert crit["bounds"]["max_real_center_p50_px"] == 8.0


def test_gate_iris_criteria():
    """VERDICT r4 #3: the iris center — half of the reference's primary
    center metric (test.py:235-238) — is gated on the same footing as the
    pupil: val excess vs the teacher and real-clip median delta."""
    base = {"miou_drop": 0.01, "agreement_miou": 0.95,
            "student_pup_c_seg": 4.0, "teacher_pup_c_seg": 3.0,
            "student_iri_c_seg": 4.0, "teacher_iri_c_seg": 3.5}
    assert distill_gate(base)
    assert not distill_gate(dict(base, student_iri_c_seg=6.0))
    assert not distill_gate(dict(base, real_iris_c_delta_p50=9.5))
    assert distill_gate(dict(base, real_iris_c_delta_p50=6.0))
    # records land per-structure
    crit = {}
    distill_gate(dict(base, real_iris_c_delta_p50=9.5,
                      real_pup_c_delta_p50=3.0), criteria_out=crit)
    assert crit["center_real_p50_ok"] and not crit["iris_real_p50_ok"]
    assert crit["iris_val_ok"]
    # missing iris metrics (pre-r5 records) skip the criterion
    assert distill_gate({"miou_drop": 0.01, "agreement_miou": 0.95})


def test_paired_center_excess_ci():
    """VERDICT r4 weak #1: the center criteria adjudicated near-misses on
    32-sample point estimates — the excess now carries a paired bootstrap
    CI that the gate records next to the verdict."""
    from eghmd_tpu.training.distill import paired_center_excess_ci

    rng = np.random.default_rng(5)
    t = rng.uniform(2.0, 6.0, size=128)
    lo, hi = paired_center_excess_ci(t, t + 1.5)
    assert lo == pytest.approx(1.5) and hi == pytest.approx(1.5)
    # NaN (missing annotation) tolerated; empty -> NaN interval
    t2 = t.copy()
    t2[::3] = np.nan
    lo2, hi2 = paired_center_excess_ci(t2, t2 + 1.5)
    assert np.isfinite(lo2) and np.isfinite(hi2)
    lo3, hi3 = paired_center_excess_ci(np.array([]), np.array([]))
    assert np.isnan(lo3) and np.isnan(hi3)

    fid = {"miou_drop": 0.01, "agreement_miou": 0.95,
           "student_pup_c_seg": 4.5, "teacher_pup_c_seg": 3.0,
           "center_excess_ci95": [1.1, 2.4],
           "iris_center_excess_ci95": [0.2, 0.9]}
    crit = {}
    assert distill_gate(fid, criteria_out=crit)  # point estimate passes
    assert crit["center_excess_ci95"] == [1.1, 2.4]
    assert crit["center_excess_ci95_within_bar"] is False  # 2.4 > 2.0
    assert crit["iris_center_excess_ci95_within_bar"] is True


def test_paired_miou_drop_ci():
    """VERDICT r3 weak #3: near-bar gate verdicts need a confidence
    treatment — the CI is paired per-sample so a constant offset yields a
    degenerate interval at exactly the offset."""
    from eghmd_tpu.training.distill import paired_miou_drop_ci

    rng = np.random.default_rng(3)
    t = rng.uniform(0.8, 1.0, size=(64, 3))
    lo, hi = paired_miou_drop_ci(t, t.copy())
    assert lo == pytest.approx(0.0) and hi == pytest.approx(0.0)
    lo, hi = paired_miou_drop_ci(t, t - 0.05)
    assert lo == pytest.approx(0.05) and hi == pytest.approx(0.05)
    # NaN rows (absent classes / missing annotations) are tolerated
    t2 = t.copy()
    t2[::2, 0] = np.nan
    lo2, hi2 = paired_miou_drop_ci(t2, t2 - 0.05)
    assert np.isfinite(lo2) and np.isfinite(hi2)

    # the gate records the CI and whether even its upper bound clears the
    # drop budget; acceptance itself stays on the point estimate
    fid = {"miou_drop": 0.05, "agreement_miou": 0.95,
           "miou_drop_ci95": [0.045, 0.055]}
    crit = {}
    assert distill_gate(fid, max_miou_drop=0.06, criteria_out=crit)
    assert crit["miou_drop_ci95"] == [0.045, 0.055]
    assert crit["miou_drop_ci_within_bar"] is True
    crit = {}
    # point estimate exactly at the bar still passes, but the CI's upper
    # bound exceeds it -> the record flags the pass as near-bar
    assert distill_gate(fid, max_miou_drop=0.05, criteria_out=crit)
    assert crit["miou_drop_ci_within_bar"] is False


def test_regate_artifacts(tmp_path):
    """scripts/regate_artifacts.py re-applies the CURRENT gate to on-disk
    gate.json records (VERDICT r3 #2): center criteria demote a previously
    accepted rung, the old verdict is preserved as accepted_miou_only, and
    a missing 64-frame real metric falls back to real_protocol.json with
    the source recorded."""
    import json

    from scripts.regate_artifacts import main as regate_main

    art = tmp_path / "artifacts"
    ok = {"miou_drop": 0.005, "agreement_miou": 0.97,
          "student_pup_c_seg": 4.0, "teacher_pup_c_seg": 3.14,
          "real_pup_c_delta_p50": 4.5, "accepted": True}
    bad_center = dict(ok, student_pup_c_seg=8.0)
    no_real = {k: v for k, v in ok.items()
               if k != "real_pup_c_delta_p50"}
    for name, rec in (("good", ok), ("bad", bad_center), ("noreal", no_real)):
        d = art / name
        d.mkdir(parents=True)
        (d / "gate.json").write_text(json.dumps(rec))
    (art / "noreal" / "real_protocol.json").write_text(json.dumps(
        {"vs_teacher": {"pup_c_delta_p50": 9.5}}))
    # a non-distill gate (e.g. the BDCN F1 gate) must be left alone
    (art / "bdcn").mkdir()
    (art / "bdcn" / "gate.json").write_text(json.dumps({"f1": 0.4}))

    res = regate_main(["--artifacts", str(art)])
    assert res["good"]["accepted"] and res["good"]["was"]
    assert not res["bad"]["accepted"] and res["bad"]["was"]
    assert "bdcn" not in res

    bad = json.loads((art / "bad" / "gate.json").read_text())
    assert bad["accepted_miou_only"] is True and bad["accepted"] is False
    assert bad["criteria"]["center_val_ok"] is False
    nr = json.loads((art / "noreal" / "gate.json").read_text())
    assert nr["criteria"]["real_p50_source"] == "real_protocol_whole_clip"
    assert nr["criteria"]["center_real_p50_ok"] is False  # 9.5 > 8.0
    assert nr["accepted"] is False


@pytest.fixture(scope="module")
def distill_setup():
    """Tiny teacher (baseline chz=8) + tiny student (input_concat chz=8)."""
    cfg = ExperimentConfig(setting="baseline_input_concat", epochs=2,
                           batchsize=8, image_size=SIZE, lr=1e-3)
    t_variant = scaled_variant(VARIANT_PRESETS["baseline"], 8)
    s_variant = scaled_variant(VARIANT_PRESETS["baseline_input_concat"], 8)
    teacher = build_model("ritnet_v2", t_variant, chz=8)
    student = build_model("ritnet_v2", s_variant, chz=8)
    x0 = jnp.zeros((1, *SIZE, 1), jnp.float32)
    teacher_vars = jax.jit(
        lambda r, a, b: teacher.init(r, a, b, train=False)
    )(jax.random.PRNGKey(7), x0, x0)
    trainer = DistillTrainer(cfg, student, teacher, teacher_vars,
                             distill=DistillConfig(w_gt=1.0), log_fn=None)
    ds = SyntheticEyeDataset(16, SIZE, seed=5)
    pipe = DataPipeline(ds, batch_size=8, sharding=batch_sharding(trainer.mesh),
                        shuffle=False, num_workers=2)
    return trainer, pipe


class TestDistillStep:
    def test_loss_decreases_teacher_frozen(self, distill_setup):
        trainer, pipe = distill_setup
        batch = next(iter(pipe))
        state = trainer.init_state(batch)
        t_leaf0 = np.asarray(jax.tree.leaves(trainer.teacher_vars["params"])[0])
        p0 = np.asarray(jax.tree.leaves(state.params)[0])
        losses = []
        for _ in range(6):
            state, metrics = trainer.distill_step(state, trainer.teacher_vars,
                                                  batch, 0.5)
            losses.append(float(metrics["loss"]))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        assert 0.0 <= float(metrics["agreement_miou"]) <= 1.0
        # student moved, teacher untouched
        assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]), p0)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(trainer.teacher_vars["params"])[0]),
            t_leaf0)

    def test_center_kd_term(self, distill_setup):
        """w_center adds a differentiable soft-argmax center-matching term
        (VERDICT r3 #2's retraining lever) that trains without breaking the
        step; its aux metric must appear and shrink."""
        import optax

        from eghmd_tpu.training.distill import (DistillConfig,
                                                make_distill_step)

        trainer, pipe = distill_setup
        batch = next(iter(pipe))
        state = trainer.init_state(batch)
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
        step = make_distill_step(
            trainer.student, trainer.teacher, tx,
            DistillConfig(w_gt=0.0, w_center=20.0), donate=False)
        state = state._replace(opt_state=tx.init(state.params))
        cvals = []
        for _ in range(6):
            state, metrics = step(state, trainer.teacher_vars, batch, 0.5)
            cvals.append(float(metrics["kd_center"]))
        assert np.all(np.isfinite(cvals))
        assert cvals[-1] < cvals[0], cvals

    def test_fidelity_and_gate(self, distill_setup):
        trainer, pipe = distill_setup
        batch = next(iter(pipe))
        state = trainer.init_state(batch)
        fid = evaluate_fidelity(trainer.fidelity_step, state,
                                trainer.teacher_vars, pipe, max_batches=1)
        for k in ("agreement_miou", "student_miou", "teacher_miou",
                  "miou_drop"):
            assert k in fid and np.isfinite(fid[k]), (k, fid)
        lo, hi = fid["miou_drop_ci95"]
        assert lo <= hi and fid["n_eval_samples"] == 8
        assert isinstance(distill_gate(fid), bool)


def test_real_frame_agreement_mechanics(distill_setup, tmp_path):
    """The no-GT real-frame pass (teacher<->student agreement on decoded
    video frames, VERDICT r1 item 5) must run end-to-end on a video and
    return finite agreement/center-delta values; a student compared against
    itself must score perfect agreement."""
    import cv2

    from eghmd_tpu.training import real_frame_agreement

    trainer, pipe = distill_setup
    batch = next(iter(pipe))
    state = trainer.init_state(batch)

    rng = np.random.RandomState(0)
    path = str(tmp_path / "eye.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (SIZE[1], SIZE[0]))
    for _ in range(5):
        vw.write(np.stack([rng.randint(0, 255, SIZE, np.uint8)] * 3, 2))
    vw.release()

    # shared decoder: skip_frames gives training crops a frame range
    # disjoint from the agreement eval, and single-eye-wide clips deliver
    # the full crop request (1 crop/frame, not an assumed 2)
    from eghmd_tpu.data import decode_eye_crops, decode_gray_frames

    fr = decode_gray_frames(path, 10)
    assert fr.shape[0] == 5
    fr2 = decode_gray_frames(path, 10, skip_frames=2)
    assert fr2.shape[0] == 3 and np.array_equal(fr2[0], fr[2])
    eyes = decode_eye_crops(path, 4, SIZE)
    assert eyes.shape == (4, *SIZE)

    out = real_frame_agreement(trainer.student, trainer.teacher, state,
                               trainer.teacher_vars, path, n_frames=5,
                               batch=4, eye_size=SIZE)
    assert out is not None and out["real_frames"] == 5
    assert 0.0 <= out["real_agreement_miou"] <= 1.0
    assert np.isfinite(out["real_pup_c_delta_px"])

    # self-agreement: student vs the same student must be exact
    self_out = real_frame_agreement(
        trainer.student, trainer.student, state,
        {"params": state.params, "batch_stats": state.batch_stats},
        path, n_frames=5, batch=4, eye_size=SIZE)
    assert self_out["real_agreement_miou"] == pytest.approx(1.0)
    assert self_out["real_pup_c_delta_px"] == pytest.approx(0.0, abs=1e-4)

    assert real_frame_agreement(trainer.student, trainer.teacher, state,
                                trainer.teacher_vars,
                                str(tmp_path / "missing.avi"),
                                eye_size=SIZE) is None


def test_real_frame_refine_ab_mechanics(distill_setup):
    """The refinement on/off A/B (VERDICT r3 #5) must return per-eye
    iris/pupil raster-IoU and bbox-IoU arrays for raw and refined student
    ellipses, all finite in [0, 1]."""
    from eghmd_tpu.training.distill import real_frame_refine_ab

    trainer, pipe = distill_setup
    batch = next(iter(pipe))
    state = trainer.init_state(batch)

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 255, (5, SIZE[0], SIZE[1]), np.uint8)
    out = real_frame_refine_ab(
        trainer.student, {"params": state.params,
                          "batch_stats": state.batch_stats},
        trainer.teacher, trainer.teacher_vars, frames,
        batch=4, eye_size=SIZE, num_sweeps=3)
    keys = {f"{n}_{m}_{v}" for n in ("iris", "pupil")
            for m in ("segiou", "bbiou", "bbiou_rawT")
            for v in ("raw", "ref")}
    assert set(out) == keys
    for k, v in out.items():
        assert v.shape == (5,), (k, v.shape)
        assert np.all(np.isfinite(v)) and np.all((v >= 0) & (v <= 1)), k


def test_real_mix_pseudo_labels(distill_setup):
    """Teacher pseudo-labeling turns raw eye crops into fully-annotated
    Samples (all-valid cond, teacher argmax as label, boundary weights /
    distance maps computed from it) that concatenate with a synthetic set
    and drive a distill step — the --real_mix path of cli/distill.py."""
    from eghmd_tpu.data import (ConcatDataset, ListDataset, collate,
                                eyes_from_frames)
    from eghmd_tpu.data.pipeline import DataPipeline as DP
    from eghmd_tpu.training import pseudo_label_real_samples

    trainer, pipe = distill_setup

    # dual-eye-wide frames split at the midline; odd height chops to SIZE
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 255, (3, SIZE[0] + 20, 2 * SIZE[1]), np.uint8)
    eyes = eyes_from_frames(frames, SIZE)
    assert eyes.shape == (6, *SIZE)

    samples = pseudo_label_real_samples(trainer.teacher, trainer.teacher_vars,
                                        eyes, batch=4)
    assert len(samples) == 6
    s = samples[0]
    assert s.image.shape == (*SIZE, 1) and s.target.shape == SIZE
    assert set(np.unique(s.target)) <= {0, 1, 2}
    np.testing.assert_array_equal(s.cond, np.zeros(4))  # all annotations valid
    assert s.spat_weights.min() >= 1.0  # 1 + 20*boundary
    assert s.dist_map.shape == (*SIZE, 3)
    assert np.all(np.isfinite(s.el_norm)) and s.el_norm.shape == (2, 5)
    # centers are inside the frame (px coords)
    assert 0 <= s.pupil_center[0] <= SIZE[1] and 0 <= s.pupil_center[1] <= SIZE[0]

    # mixes with the synthetic set and trains
    from eghmd_tpu.data import SyntheticEyeDataset
    from eghmd_tpu.parallel import batch_sharding

    mixed = ConcatDataset(SyntheticEyeDataset(4, SIZE, seed=9),
                          ListDataset(samples))
    assert len(mixed) == 10
    assert mixed[9].target.shape == SIZE  # indexes into the second dataset
    mpipe = DP(mixed, batch_size=8, sharding=batch_sharding(trainer.mesh),
               shuffle=True, num_workers=2)
    state = trainer.init_state(next(iter(pipe)))
    batch = next(iter(mpipe))
    state, metrics = trainer.distill_step(state, trainer.teacher_vars,
                                          batch, 0.5)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_distill_fit_improves_agreement(distill_setup):
    """Two distillation epochs raise the student's agreement with the
    teacher — the subsystem's reason for existing."""
    trainer, pipe = distill_setup
    state = trainer.init_state(next(iter(pipe)))
    fid0 = evaluate_fidelity(trainer.fidelity_step, state,
                             trainer.teacher_vars, pipe)
    state, history = trainer.fit(pipe, pipe, state=state)
    fid1 = history[-1]["fidelity"]
    assert fid1["agreement_miou"] > fid0["agreement_miou"], (fid0, fid1)


@pytest.mark.slow
def test_distill_cli_smoke(tmp_path):
    """End-to-end driver: random teacher, 1 epoch, gate line printed."""
    import json
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "cli/distill.py", "--synthetic", "16", "--epochs", "1",
         "--chz", "8", "--teacher_chz", "8", "--teacher_setting", "baseline",
         "--batchsize", "8", "--image_height", "176", "--image_width", "192",
         "--log_dir", str(tmp_path)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert "accepted" in rec and "agreement_miou" in rec
    # the verdict is persisted beside the artifact so bench.py's checkpoint
    # auto-discovery can refuse students that never passed their gate
    with open(tmp_path / "distill" / "distill" / "gate.json") as f:
        assert json.load(f)["accepted"] == rec["accepted"]

    # --init_ckpt + --resume 1 on a FRESH expname must fall back to the
    # partial bootstrap (not silently train from random weights): retry
    # wrappers always pass --resume, and losing the warm start on attempt 1
    # wastes an entire training stage.
    out2 = subprocess.run(
        [sys.executable, "cli/distill.py", "--synthetic", "16", "--epochs",
         "1", "--chz", "8", "--teacher_chz", "8", "--teacher_setting",
         "baseline", "--batchsize", "8", "--image_height", "176",
         "--image_width", "192", "--log_dir", str(tmp_path),
         "--expname", "boot",
         "--init_ckpt", str(tmp_path / "distill" / "distill" / "checkpoints"),
         "--resume", "1"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "running the requested initialization" in out2.stdout
    assert "partially bootstrapped" in out2.stdout


class TestServingShapeDistill:
    """Shortcut-calibrated distillation: the student TRAINS at its serving
    configuration (seg_downscale decoder + fast-edge input) while the KD
    target is the teacher at full fidelity. Post-hoc downscales fail the
    gate at trained checkpoints (BASELINE.md round-2 gate table), so the
    gate must cover the exact serving shape."""

    def test_seg_downscale_student_trains_through(self):
        cfg = ExperimentConfig(setting="baseline_input_concat", epochs=1,
                               batchsize=8, image_size=SIZE, lr=1e-3)
        t_variant = scaled_variant(VARIANT_PRESETS["baseline"], 8)
        s_variant = scaled_variant(VARIANT_PRESETS["baseline_input_concat"], 8)
        teacher = build_model("ritnet_v2", t_variant, chz=8)
        student = build_model("ritnet_v2", s_variant, chz=8, seg_downscale=2)
        x0 = jnp.zeros((1, *SIZE, 1), jnp.float32)
        teacher_vars = jax.jit(
            lambda r, a, b: teacher.init(r, a, b, train=False)
        )(jax.random.PRNGKey(7), x0, x0)

        # distinct teacher edge source (full-fidelity) vs student edge
        calls = {"teacher": 0}

        def student_edge(img):
            return jnp.zeros_like(img)

        def teacher_edge(img):
            calls["teacher"] += 1  # traced once per compilation
            return jnp.ones_like(img) * 0.5

        trainer = DistillTrainer(cfg, student, teacher, teacher_vars,
                                 distill=DistillConfig(w_gt=1.0),
                                 edge_fn=student_edge,
                                 teacher_edge_fn=teacher_edge, log_fn=None)
        ds = SyntheticEyeDataset(16, SIZE, seed=5)
        pipe = DataPipeline(ds, batch_size=8,
                            sharding=batch_sharding(trainer.mesh),
                            shuffle=False, num_workers=0)
        batch = next(iter(pipe))
        state = trainer.init_state(batch)
        losses = []
        for _ in range(4):
            state, metrics = trainer.distill_step(state, trainer.teacher_vars,
                                                  batch, 0.5)
            losses.append(float(metrics["loss"]))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        assert calls["teacher"] >= 1  # the teacher path was traced

        # fidelity covers the serving shape: student decodes at 1/2 but
        # emits full-res logits (bilinear upsample inside the model)
        fid = evaluate_fidelity(trainer.fidelity_step, state,
                                trainer.teacher_vars, pipe, max_batches=1)
        assert np.isfinite(fid["miou_drop"])
        assert 0.0 <= fid["agreement_miou"] <= 1.0


def test_real_protocol_cli(distill_setup, tmp_path):
    """cli/real_protocol.py (VERDICT r2 #6): re-score a trained artifact on
    the WHOLE clip post hoc, exclude the args.json-recorded training frame
    range (out-of-sample), report the per-frame p10/p50/p90 distribution,
    and support an A/B block (a student against itself must agree 1.0)."""
    import json
    import os

    import cv2
    import orbax.checkpoint as ocp

    from cli.real_protocol import main as rp_main

    trainer, pipe = distill_setup
    batch = next(iter(pipe))
    state = trainer.init_state(batch)

    rng = np.random.RandomState(1)
    vid = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (SIZE[1], SIZE[0]))
    for _ in range(8):
        vw.write(np.stack([rng.randint(0, 255, SIZE, np.uint8)] * 3, 2))
    vw.release()

    ckptr = ocp.PyTreeCheckpointer()
    t_dir = tmp_path / "teacher" / "checkpoints"
    ckptr.save(str(t_dir / "best"),
               {"params": trainer.teacher_vars["params"],
                "batch_stats": trainer.teacher_vars.get("batch_stats", {})})
    s_dir = tmp_path / "student"
    ckptr.save(str(s_dir / "checkpoints" / "best"),
               {"params": state.params, "batch_stats": state.batch_stats})
    (s_dir / "args.json").write_text(json.dumps({"args": {
        "setting": "baseline_input_concat", "chz": 8, "growth": 1.2,
        "seg_downscale": 1, "input_downscale": 1, "edge_downscale": 1,
        "edge_thres": 0, "image_height": SIZE[0], "image_width": SIZE[1],
        "teacher_setting": "baseline", "teacher_chz": 8,
        "teacher_growth": 1.2, "real_mix": 2, "real_frames": 2,
        "bdcn_weights": ""}}))

    rec = rp_main(["--ckpt", str(s_dir), "--teacher_ckpt", str(t_dir),
                   "--video", vid, "--batch", "4"])
    assert rec["clip_frames"] == 8
    # real_mix=2 single-eye crops starting at frame 2 -> frames [2, 4) seen
    assert rec["excluded_train_frames"] == [2, 4]
    assert rec["eval_frames"] == 6 and rec["eval_eyes"] == 6
    vt = rec["vs_teacher"]
    assert (0.0 <= vt["agreement_p10"] <= vt["agreement_p50"]
            <= vt["agreement_p90"] <= 1.0)
    assert np.isfinite(vt["pup_c_delta_p90"])
    assert os.path.isfile(s_dir / "real_protocol.json")

    rec2 = rp_main(["--ckpt", str(s_dir), "--ckpt_b", str(s_dir),
                    "--teacher_ckpt", str(t_dir), "--video", vid,
                    "--batch", "4"])
    assert rec2["a_vs_b"]["agreement_miou"] == pytest.approx(1.0)
    assert rec2["a_vs_b"]["pup_c_delta_px"] == pytest.approx(0.0, abs=1e-4)
    assert rec2["b_vs_teacher"]["agreement_miou"] == pytest.approx(
        rec2["vs_teacher"]["agreement_miou"], abs=1e-6)
