"""End-to-end smoke tests for the CLI drivers on synthetic data.

Covers the drivers the reference ships (test.py, calc_model_score.py,
image_select.py, process_application_data.py, datasetSelections) through
their actual main() entry points.
"""

import os
import pickle

import numpy as np
import pytest


@pytest.mark.slow  # compiles a full model on the 1-CPU mesh
class TestTestDriver:
    def test_eval_and_record_iou(self, tmp_path):
        from cli.test import main

        iou_pkl = str(tmp_path / "ious.pkl")
        res = main([
            "--synthetic", "16", "--batchsize", "8",
            "--image_height", "176", "--image_width", "192",
            "--setting", "baseline", "--record_iou", "1",
            "--iou_filename", iou_pkl,
        ])
        assert np.isfinite(res["mean_iou"])
        with open(iou_pkl, "rb") as f:
            per_sample = np.asarray(pickle.load(f))
        # test split of --synthetic 16 is max(16 // 4, 8) = 8 samples
        assert per_sample.shape == (8, 3)  # per-sample per-class IoU dump


@pytest.mark.slow  # compiles a full model on the 1-CPU mesh
class TestModelZooScorer:
    def test_score_table(self, tmp_path):
        from cli.calc_model_score import main

        out = str(tmp_path / "scores.csv")
        df = main([
            "--models", "baseline", "--datasets", "synthetic",
            "--synthetic", "16", "--batchsize", "8", "--out", out,
        ])
        assert os.path.exists(out)
        # the reference's 8 score columns (calc_model_score.py:192-198)
        for col in ("mIou", "bg_iou", "iris_iou", "pup_iou",
                    "reg_pup", "reg_iris", "seg_pup", "seg_iris"):
            assert col in df.columns, df.columns


class TestImageSelect:
    def test_selects_edge_wins(self, tmp_path):
        from cli.image_select import main

        rng = np.random.RandomState(0)
        base = rng.uniform(0.4, 0.6, (50, 3))
        meth = base.copy()
        meth[:5, 1] = base[:5, 1] + 0.3  # edge method wins big on 5 samples
        meth[:5, 1] = np.clip(meth[:5, 1], 0, 0.95)
        meth[5:, 1] = base[5:, 1]
        b, m = str(tmp_path / "b.pkl"), str(tmp_path / "m.pkl")
        pickle.dump(base, open(b, "wb"))
        pickle.dump(meth, open(m, "wb"))
        out = str(tmp_path / "sel.pkl")
        sel = main(["--baseline", b, "--method", m, "--min_iou", "0.7",
                    "--out", out])
        assert set(sel) == set(range(5))


class TestAppDataConverter:
    def test_csv_to_pkl(self, tmp_path):
        import pandas as pd

        from cli.process_application_data import main

        for name in ("pupil0", "pupil1", "gt"):
            pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]}).to_csv(
                tmp_path / f"{name}.csv", index=False)
        out = str(tmp_path / "data.pkl")
        main(["--pupil0", str(tmp_path / "pupil0.csv"),
              "--pupil1", str(tmp_path / "pupil1.csv"),
              "--gt", str(tmp_path / "gt.csv"), "--out", out])
        with open(out, "rb") as f:
            data = pickle.load(f)
        assert set(data) == {"pupil0", "pupil1", "gt"}
        assert data["gt"].shape == (2, 2)


class TestExtractCLI:
    def test_selections_subcommand(self, tmp_path):
        from cli.extract_dataset import main

        out = str(tmp_path / "sel.pkl")
        sel = main(["selections", "--out", out])
        with open(out, "rb") as f:
            assert pickle.load(f) == sel
        assert sel["train"]["LPW"] == ["LPW_2500"]

    def test_lpw_subcommand_end_to_end(self, tmp_path):
        """Full directory-walk driver over synthesized raw LPW inputs."""
        import cv2

        from cli.extract_dataset import main
        from test_generation import _make_avi, _teyed_rows, _write_ann

        ds = tmp_path / "Datasets"
        (ds / "LPW" / "1").mkdir(parents=True)
        ann_dir = ds / "LPW-ANNOTATIONS"
        ann_dir.mkdir()
        _make_avi(str(ds / "LPW" / "1" / "5.avi"), 24)
        # reference format: '<person>/<vid>.avi./LPW_<p>_<i>.mp4'
        # (parsed as key=split('.')[0], value=split('.')[-2] —
        # Extract_TEyeD_LPW_histo.py:88-93)
        (ann_dir / "fileassignement.txt").write_text("1/5.avi./LPW_1_1.mp4\n")
        _write_ann(str(ann_dir), "LPW_1_1.mp4", _teyed_rows(24))

        h5_path, mat_path = main([
            "lpw", "--path2ds", str(ds), "--pic_num", "21809",  # interval 6
        ])
        assert os.path.exists(h5_path) and os.path.exists(mat_path)
        from eghmd_tpu.data import H5EyeDataset

        d = H5EyeDataset([h5_path], size=(480, 640), scale=None)
        assert len(d) == 24 // 6


class TestDispGrid:
    @pytest.mark.slow  # compiles a full model on the 1-CPU mesh
    def test_disp_saves_annotated_grid(self, tmp_path):
        from cli.test import main

        vd = str(tmp_path / "vis")
        main([
            "--synthetic", "16", "--batchsize", "8",
            "--image_height", "176", "--image_width", "192",
            "--setting", "baseline", "--disp", "1", "--visual_dir", vd,
        ])
        import cv2

        grid = cv2.imread(os.path.join(vd, "disp_grid.png"))
        assert grid is not None
        assert grid.shape == (2 * 176, 4 * 192, 3)  # 8 tiles, 4 cols

    def test_generate_image_grid_shapes(self):
        from eghmd_tpu.utils.visual import generate_image_grid

        rng = np.random.RandomState(0)
        imgs = rng.rand(3, 32, 48)
        preds = rng.randint(0, 3, (3, 32, 48))
        ells = np.tile(np.array([[24.0, 16.0, 10.0, 8.0, 0.3],
                                 [24.0, 16.0, 5.0, 4.0, -0.2]]), (3, 1, 1))
        grid = generate_image_grid(imgs, preds, pred_ellipses=ells, cols=2)
        assert grid.shape == (2 * 32, 2 * 48, 3)
        assert grid.dtype == np.uint8


class TestEdgeAgreement:
    @pytest.mark.slow  # compiles BDCN at three resolutions on the 1-CPU mesh
    def test_real_frame_edge_stats(self, tmp_path):
        """cli/edge_agreement.py end-to-end on a tiny synthetic clip.

        Mirrors the reference's demo-video serving input (evaluate.py:357-358)
        at a small resolution: writes a 4-frame avi, runs the CLI with a
        random BDCN, and checks the JSON stats are well-formed (density in
        [0,1], fast-edge F1 vs full defined for every factor)."""
        import cv2

        from cli.edge_agreement import main

        path = str(tmp_path / "clip.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                            (128, 96))
        rng = np.random.RandomState(0)
        for _ in range(4):
            frame = rng.randint(0, 255, (96, 128), np.uint8)
            cv2.circle(frame, (64, 48), 20, 40, -1)
            w.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
        w.release()

        out = main([
            "--bdcn_weights", "random", "--video", path, "--frames", "4",
            "--factors", "2", "--image_height", "48", "--image_width", "64",
        ])
        assert out["frames"] == 4
        assert 0.0 <= out["edge_density_full"] <= 1.0
        assert 0.0 <= out["fast2_f1_vs_full"] <= 1.0
        assert 0.0 <= out["fast2_density"] <= 1.0


class TestHostBench:
    def test_host_pipeline_bench_runs(self, capsys):
        """cli/bench_host.py measures the per-sample host chain (native C++
        EDT vs the scipy fallback) and the threaded pipeline without ever
        touching a device backend (it must run while the TPU tunnel is
        down)."""
        from cli.bench_host import main

        out = main(["--n", "3", "--batchsize", "3", "--workers", "2",
                    "--image_height", "96", "--image_width", "128"])
        key = "native" if out["native_available"] else "python"
        assert out[f"samples_per_sec_{key}"] > 0
        assert out["pipeline_samples_per_sec"] > 0
        if out["native_available"]:
            # the native EDT exists to beat scipy; a tiny shape is noisy so
            # just require it not be dramatically slower
            assert out["edt_ms_native"] < 4 * out["edt_ms_python"]
        line = capsys.readouterr().out.strip().splitlines()[-1]
        import json

        rec = json.loads(line)
        assert rec["metric"] == "host_pipeline_samples_per_sec"


class TestBenchCheckpointAutodiscovery:
    """bench.py serves the canonical regenerated artifacts
    (scripts/regen_artifacts.sh) when its --*ckpt flags are empty — but a
    distilled student is only served if its run recorded a PASSING fidelity
    gate (cli/distill.py writes gate.json beside the checkpoints)."""

    def _args(self, input_downscale=0):
        import argparse

        return argparse.Namespace(setting="baseline_edge", chz=32,
                                  edge_downscale=4, seg_downscale=4,
                                  input_downscale=input_downscale,
                                  ckpt="", bdcn_ckpt="", student_ckpt="")

    def _layout(self, tmp_path, accepted=None):
        import json

        for rel in ("logs/distill/calib_e4s4_rm2/checkpoints",
                    "logs/distill/ns_chz6_rm2/checkpoints",
                    "logs/bdcn/r2/checkpoints"):
            (tmp_path / rel).mkdir(parents=True)
        if accepted is not None:
            for run in ("calib_e4s4_rm2", "ns_chz6_rm2"):
                gate = tmp_path / "logs/distill" / run / "gate.json"
                gate.write_text(json.dumps({"accepted": accepted}))

    def test_serves_gated_artifacts(self, tmp_path):
        import bench

        self._layout(tmp_path, accepted=True)
        args = self._args()
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.ckpt.endswith("calib_e4s4_rm2/checkpoints")
        assert args.student_ckpt.endswith("ns_chz6_rm2/checkpoints")
        assert args.student_cfg["input_downscale"] == 1
        assert args.bdcn_ckpt.endswith("bdcn/r2/checkpoints")

    def test_prefers_faster_gated_student_rung(self, tmp_path):
        import json

        import bench

        self._layout(tmp_path, accepted=True)
        in2 = tmp_path / "logs/distill/ns_chz6_in2_rm2"
        (in2 / "checkpoints").mkdir(parents=True)
        (in2 / "gate.json").write_text(json.dumps({"accepted": True}))
        args = self._args()
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.student_ckpt.endswith("ns_chz6_in2_rm2/checkpoints")
        assert args.student_cfg["input_downscale"] == 2
        # an in2 rung whose gate FAILED must not displace the gated in1 rung
        (in2 / "gate.json").write_text(json.dumps({"accepted": False}))
        args = self._args()
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.student_ckpt.endswith("ns_chz6_rm2/checkpoints")
        assert args.student_cfg["input_downscale"] == 1

    def test_refuses_unaccepted_or_ungated(self, tmp_path):
        import bench

        self._layout(tmp_path, accepted=False)
        args = self._args()
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.ckpt == "" and args.student_ckpt == ""
        # BDCN has no fidelity gate (its evidence is the downstream mIoU
        # table in BASELINE.md) — still served
        assert args.bdcn_ckpt.endswith("bdcn/r2/checkpoints")
        self._layout(tmp_path.joinpath("no_gate"), accepted=None)
        args = self._args()
        bench._autodiscover_checkpoints(args, root=str(tmp_path / "no_gate"))
        assert args.ckpt == "" and args.student_ckpt == ""

    def test_explicit_flags_win(self, tmp_path):
        import bench

        self._layout(tmp_path, accepted=True)
        args = self._args()
        args.ckpt = "explicit"
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.ckpt == "explicit"

    def test_shape_mismatch_serves_no_flagship_ckpt(self, tmp_path):
        import bench

        self._layout(tmp_path, accepted=True)
        args = self._args()
        args.seg_downscale = 1  # not a shape any calibrated student was gated at
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.ckpt == ""
        assert args.student_ckpt.endswith("ns_chz6_rm2/checkpoints")

    def test_committed_artifacts_preferred_over_logs(self, tmp_path):
        """The committed artifacts/ tree outranks live logs/ run dirs: the
        repo alone must carry the served evidence (VERDICT r2 #1)."""
        import json

        import bench

        self._layout(tmp_path, accepted=True)
        for run in ("calib_e4s4_rm2", "ns_chz6_rm2", "bdcn"):
            art = tmp_path / "artifacts" / run
            (art / "checkpoints").mkdir(parents=True)
            (art / "gate.json").write_text(json.dumps({"accepted": True}))
        args = self._args()
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert "artifacts/calib_e4s4_rm2" in args.ckpt
        assert "artifacts/ns_chz6_rm2" in args.student_ckpt
        assert "artifacts/bdcn" in args.bdcn_ckpt

    def test_fast_input_flagship_promotion_requires_passing_gate(
            self, tmp_path):
        """--input-downscale 0 (the default) promotes the flagship to the
        in/2 operating point ONLY when a gate-passing calibrated artifact
        for that exact shape is on disk (VERDICT r2 #4)."""
        import json

        import bench

        self._layout(tmp_path, accepted=True)
        args = self._args(input_downscale=0)
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.input_downscale == 1  # no in/2 artifact -> full-res
        assert args.ckpt.endswith("calib_e4s4_rm2/checkpoints")

        in2 = tmp_path / "logs/distill/calib_e4s4_in2_rm2"
        (in2 / "checkpoints").mkdir(parents=True)
        (in2 / "gate.json").write_text(json.dumps({"accepted": False}))
        args = self._args(input_downscale=0)
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.input_downscale == 1  # failed gate -> no promotion

        (in2 / "gate.json").write_text(json.dumps({"accepted": True}))
        args = self._args(input_downscale=0)
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.input_downscale == 2
        assert args.ckpt.endswith("calib_e4s4_in2_rm2/checkpoints")

        # an explicit --input-downscale 1 is never promoted
        args = self._args(input_downscale=1)
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.input_downscale == 1
        assert args.ckpt.endswith("calib_e4s4_rm2/checkpoints")

    def test_failed_artifact_does_not_shadow_gated_retry(self, tmp_path):
        """Candidates are scanned past a gate-FAILING artifact: the
        from-scratch in/2 attempt (accepted: false, kept as committed
        negative evidence) must not shadow the gated partial-bootstrap
        retry listed ahead of it, nor block promotion when only the
        retry passed."""
        import json

        import bench

        self._layout(tmp_path, accepted=True)
        scratch = tmp_path / "logs/distill/calib_e4s4_in2_rm2"
        (scratch / "checkpoints").mkdir(parents=True)
        (scratch / "gate.json").write_text(json.dumps({"accepted": False}))
        boot = tmp_path / "logs/distill/calib_e4s4_in2_boot"
        (boot / "checkpoints").mkdir(parents=True)
        (boot / "gate.json").write_text(json.dumps({"accepted": True}))

        args = self._args(input_downscale=0)
        bench._autodiscover_checkpoints(args, root=str(tmp_path))
        assert args.input_downscale == 2
        assert args.ckpt.endswith("calib_e4s4_in2_boot/checkpoints")
