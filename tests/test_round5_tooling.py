"""Round-5 evidence tooling: real-protocol visibility/tail accounting and
the gate re-evaluation driver's re-entry behavior.

The visibility split mirrors the reference's cond-mask discipline
(CurriculumLib.py:189-193 — don't score annotations that aren't there)
applied to serving: eyes whose truth-side argmax has too few pupil pixels
(blink/occlusion) are excluded from a second set of center stats, and the
worst-decile tail is classified blink-vs-genuine (VERDICT r4 missing #4).
"""

import importlib.util
import json
import os

import numpy as np
import pytest


def _load_script(name):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDistBlock:
    def _scores(self):
        from eghmd_tpu.training.distill import REAL_VISIBILITY_MIN_PUPIL_PX

        # 10 eyes: eyes 8,9 are "blinks" (tiny pupil mass on the truth
        # side) and carry the huge center deltas that pollute the tail
        n = 10
        agree = np.full(n, 0.95)
        delta = np.array([1.0, 2.0, 1.5, 2.5, 1.0, 2.0, 1.5, 2.5,
                          30.0, 40.0])
        iris = delta * 0.5
        pup_px = np.full(n, REAL_VISIBILITY_MIN_PUPIL_PX + 50.0)
        pup_px[8:] = REAL_VISIBILITY_MIN_PUPIL_PX - 80.0
        return {"agree": agree, "pup_delta": delta, "iris_delta": iris,
                "pup_px_b": pup_px}

    def test_visibility_split_and_tail_classification(self):
        from cli.real_protocol import _dist_block

        out = _dist_block(self._scores())
        assert out["visible_frac"] == pytest.approx(0.8)
        # whole-clip stats keep the blink tail ...
        assert out["pup_c_delta_p90"] > 10.0
        # ... the visible-only block removes it
        vo = out["visible_only"]
        assert vo["pup_c_delta_p90"] <= 2.5
        assert vo["pup_c_delta_px"] == pytest.approx(1.75)
        assert vo["iris_c_delta_p50"] == pytest.approx(0.875, abs=0.15)
        # the worst-decile eyes are classified: both tail eyes are blinks
        tail = out["tail_p90"]
        assert tail["n_tail_eyes"] >= 1
        assert tail["n_tail_not_visible"] == tail["n_tail_eyes"]
        assert tail["frac_tail_blink_or_occlusion"] == 1.0

    def test_all_visible_has_no_split_block(self):
        from cli.real_protocol import _dist_block

        sc = self._scores()
        sc["pup_px_b"][:] = 1e4
        out = _dist_block(sc)
        assert out["visible_frac"] == 1.0
        assert "visible_only" not in out
        assert "tail_p90" not in out

    def test_iris_reported_first_class(self):
        """Reference test.py:235-238 reports pupil AND iris center
        distance; the serving protocol mirrors that."""
        from cli.real_protocol import _dist_block

        out = _dist_block(self._scores())
        for k in ("iris_c_delta_px", "iris_c_delta_p50", "iris_c_delta_p90"):
            assert k in out


class TestTailAnalysis:
    def test_blink_like_tail_is_classified(self):
        mod = _load_script("tail_analysis")
        n = 100
        rng = np.random.RandomState(0)
        pup = rng.uniform(1, 4, n)
        px = rng.uniform(900, 1100, n)
        # eyes 40..49 (frames 20..24): an occlusion event — tiny pupil
        # mass on the truth side, huge center deltas
        pup[40:50] = rng.uniform(25, 40, 10)
        px[40:50] = rng.uniform(10, 120, 10)
        out = mod.analyze({"pup_delta": pup, "iris_delta": pup * 0.4,
                           "agree": np.full(n, 0.9), "pup_px_b": px,
                           "pup_px_a": px})
        assert out["n_tail"] == 10
        # every tail eye is relatively-small-pupil; the rest are not
        assert out["frac_tail_small_pupil"] == 1.0
        assert out["frac_rest_small_pupil"] == 0.0
        # one consecutive frame cluster -> classified as an event
        assert out["temporal"]["n_clusters"] == 1
        assert out["temporal"]["clustered"] is True
        assert out["teacher_pupil_px"]["tail"]["p50"] < \
            0.25 * out["teacher_pupil_px"]["clip_median"]

    def test_scattered_genuine_failures(self):
        mod = _load_script("tail_analysis")
        n = 200
        rng = np.random.RandomState(1)
        pup = rng.uniform(1, 4, n)
        px = rng.uniform(900, 1100, n)
        # 20 isolated eyes spread across the clip, pupil fully visible
        idx = np.arange(0, 200, 10)
        pup[idx] = rng.uniform(25, 40, idx.size)
        out = mod.analyze({"pup_delta": pup, "iris_delta": pup * 0.4,
                           "agree": np.full(n, 0.9), "pup_px_b": px,
                           "pup_px_a": px})
        assert out["frac_tail_small_pupil"] == 0.0
        assert out["temporal"]["clustered"] is False


class TestReevalReentry:
    def _fixture(self, tmp_path):
        done = tmp_path / "done_art"
        todo = tmp_path / "todo_art"
        for d in (done, todo):
            (d / "checkpoints").mkdir(parents=True)
            (d / "args.json").write_text(json.dumps({"args": {"chz": 8}}))
        (done / "gate.json").write_text(json.dumps(
            {"miou_drop": 0.001, "accepted": True, "accepted_r4": True,
             "n_eval_samples": 256}))
        (todo / "gate.json").write_text(json.dumps(
            {"miou_drop": 0.002, "accepted": True, "n_eval_samples": 32}))
        # non-distill gate records (e.g. the BDCN F1 gate) are ignored
        other = tmp_path / "bdcn_art"
        other.mkdir()
        (other / "gate.json").write_text(json.dumps(
            {"stage": "bdcn_gate", "best_val_f1": 0.5}))
        return tmp_path

    def test_skip_already_reevaluated(self, tmp_path, capsys):
        mod = _load_script("reeval_gates")
        res = mod.main(["--artifacts", str(self._fixture(tmp_path)),
                        "--dry_run"])
        # the round-5-stamped artifact is skipped; the stale one is listed
        assert res["done_art"]["skipped"] is True
        assert "todo_art" not in res  # dry_run prints, doesn't record
        out = capsys.readouterr().out
        # exactly one gate_only command printed, and it is the stale one
        cmds = [l for l in out.splitlines() if "--gate_only 1" in l]
        assert len(cmds) == 1 and "todo_art" in cmds[0]

    def test_force_reevaluates_all(self, tmp_path, capsys):
        mod = _load_script("reeval_gates")
        mod.main(["--artifacts", str(self._fixture(tmp_path)),
                  "--dry_run", "--force"])
        out = capsys.readouterr().out
        assert out.count("--gate_only 1") == 2

    def test_only_bypasses_skip(self, tmp_path, capsys):
        mod = _load_script("reeval_gates")
        mod.main(["--artifacts", str(self._fixture(tmp_path)),
                  "--dry_run", "--only", "done_art"])
        out = capsys.readouterr().out
        assert out.count("--gate_only 1") == 1
