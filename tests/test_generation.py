"""L0 dataset-generation drivers: synthetic raw inputs -> reference-schema
archives -> round trip through H5EyeDataset / read_archives.

Covers the reference's dataset_generation/ end-to-end mechanics
(Extract_TEyeD_LPW_histo.py:97-301, ExtractOpenEDS_seg_histo.py:85-262,
ExtractRITEyes_general.py:78-276, datasetSelections_histo.py:26-41).
"""

import os
import pickle

import numpy as np
import pytest

from eghmd_tpu.data.generation import (
    ArchiveBuilder,
    dataset_selections,
    extract_openeds_sample,
    extract_riteyes_sample,
    extract_teyed_dataset,
    eyelid_polygon,
    normalize_teyed_angle,
    quantize_riteyes_masks,
    read_formatted_text,
    teyed_fit_rows,
)

cv2 = pytest.importorskip("cv2")

H, W = 480, 640
PUPIL = dict(cx=320.0, cy=240.0, w=80.0, h=60.0, ang=10.0)
IRIS = dict(cx=318.0, cy=238.0, w=220.0, h=180.0, ang=5.0)
BALL = dict(cx=320.0, cy=240.0, r=150.0)


def _teyed_rows(n):
    """Per-frame annotation rows in TEyeD column layout."""
    iris, pupil, ball, lid = [], [], [], []
    lid_pts = []
    # 35 landmark pairs tracing a wide box around the eye
    for k in range(35):
        t = k / 34.0
        lid_pts += [40 + t * 560, 60 if k % 2 == 0 else 420]
    for fr in range(n):
        iris.append([fr, IRIS["ang"], IRIS["cx"], IRIS["cy"], IRIS["w"], IRIS["h"], 0.9])
        pupil.append([fr, PUPIL["ang"], PUPIL["cx"], PUPIL["cy"], PUPIL["w"], PUPIL["h"], 0.9])
        ball.append([fr, BALL["r"], BALL["cx"], BALL["cy"], 0.9])
        lid.append([fr, 0.0] + lid_pts)
    return iris, pupil, ball, lid


def _write_ann(tmp, stem, rows):
    names = ("iris_eli", "pupil_eli", "eye_ball", "lid_lm_2D")
    paths = {}
    for key, name, data in zip(("iris", "pupil", "ball", "lid"), names, rows):
        p = os.path.join(tmp, f"{stem}{name}.txt")
        with open(p, "w") as f:
            f.write("HEADER;LINE;\n")  # readFormattedText skips the first line
            for r in data:
                f.write(";".join(str(v) for v in r) + ";\n")
        paths[key] = p
    return paths


def _make_avi(path, n):
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (W, H))
    rng = np.random.RandomState(0)
    for _ in range(n):
        fr = rng.randint(0, 255, (H, W), np.uint8)
        wr.write(np.stack([fr] * 3, axis=2))
    wr.release()


class TestTEyeD:
    def test_read_formatted_text_skips_header(self, tmp_path):
        p = tmp_path / "a.txt"
        p.write_text("h;e;a;d\n0;1.5;2.5;\n1;3.5;4.5;\n")
        arr = read_formatted_text(str(p))
        np.testing.assert_allclose(arr, [[0, 1.5, 2.5], [1, 3.5, 4.5]])

    def test_angle_normalization(self):
        assert normalize_teyed_angle(30.0) == pytest.approx(np.deg2rad(30.0))
        # reference LPW:208-213: >90 wraps to negative
        assert normalize_teyed_angle(170.0) == pytest.approx(np.deg2rad(-10.0))

    def test_fit_rows_halve_axes(self):
        iris = [0, 45.0, 10.0, 20.0, 30.0, 40.0]
        pupil = [0, 100.0, 1.0, 2.0, 3.0, 4.0]
        ball = [0, 7.0, 5.0, 6.0]
        pup, iri, b = teyed_fit_rows(iris, pupil, ball)
        np.testing.assert_allclose(iri, [10, 20, 15, 20, np.deg2rad(45.0)])
        np.testing.assert_allclose(pup, [1, 2, 1.5, 2, np.deg2rad(-80.0)])
        np.testing.assert_allclose(b, [5, 6, 7, 7, 0])

    def test_eyelid_polygon_walk(self):
        row = np.arange(100, dtype=np.float64)
        poly = eyelid_polygon(row)
        assert poly.shape == (17 + 17, 2)
        np.testing.assert_array_equal(poly[0], [2, 3])
        np.testing.assert_array_equal(poly[17], [68, 69])

    def test_lpw_end_to_end_roundtrip(self, tmp_path):
        n_frames = 40
        vid = str(tmp_path / "1.avi")
        _make_avi(vid, n_frames)
        ann = _write_ann(str(tmp_path), "LPW_1_1.mp4", _teyed_rows(n_frames))

        # pic_num chosen so fix_interval = 130856 // pic_num = 4
        builder = extract_teyed_dataset("LPW", [(vid, ann)], pic_num=32714)
        assert len(builder) == n_frames // 4
        h5_path, mat_path = builder.save(str(tmp_path / "Histogram"),
                                         str(tmp_path / "Histogram_mat"),
                                         archive_name="LPW_test")

        # masks carry all three classes; pupil ellipse interior is 3
        m = builder.masks_noskin[0]
        assert set(np.unique(m)) == {0, 1, 2, 3}
        assert m[int(PUPIL["cy"]), int(PUPIL["cx"])] == 3
        # eyelid clip only zeroes pixels outside the polygon
        inskin = builder.masks[0]
        assert np.sum(inskin == 3) <= np.sum(m == 3)

        # H5 round trip through the training dataset reader
        from eghmd_tpu.data import H5EyeDataset

        ds = H5EyeDataset([h5_path], size=(H, W), scale=None)
        assert len(ds) == len(builder)
        img, mask, iris_p, pupil_p, pupil_c, cond, info = ds.read_raw(0)
        assert img.shape == (H, W)
        assert not cond.any()  # every annotation present
        np.testing.assert_allclose(pupil_c, [PUPIL["cx"], PUPIL["cy"]])
        np.testing.assert_allclose(
            pupil_p, [PUPIL["cx"], PUPIL["cy"], PUPIL["w"] / 2, PUPIL["h"] / 2,
                      np.deg2rad(PUPIL["ang"])])
        sample = ds[0]  # full __getitem__ chain must succeed
        assert sample.image.shape == (H, W, 1)

        # .mat master key round trip through the curriculum reader
        from eghmd_tpu.data.curriculum import read_archives

        all_ds = read_archives(str(tmp_path / "Histogram_mat"))
        assert all_ds["archive"].shape[0] == len(builder)
        assert str(all_ds["archive"][0]) == "LPW_test"
        # pupil_loc normalized by flipped resolution (reference
        # CurriculumLib.py:225-229)
        np.testing.assert_allclose(all_ds["pupil_loc"][0],
                                   [PUPIL["cx"] / W, PUPIL["cy"] / H])

    def test_validity_gates_skip_bad_frames(self, tmp_path):
        n = 8
        iris, pupil, ball, lid = _teyed_rows(n)
        for fr in range(n):
            pupil[fr][2] = -1.0  # invalid pupil on every frame
        ann = _write_ann(str(tmp_path), "X.mp4", (iris, pupil, ball, lid))
        frames = (np.zeros((H, W), np.uint8) for _ in range(n))
        builder = extract_teyed_dataset(
            "LPW", [(frames, ann)], pic_num=130856)  # interval 1
        assert len(builder) == 0


class TestOpenEDS:
    def _label_map(self):
        lab = np.zeros((400, W), np.uint8)
        cv2.circle(lab, (320, 200), 160, 1, -1)            # sclera
        cv2.ellipse(lab, (320, 200), (100, 80), 0, 0, 360, 2, -1)
        cv2.ellipse(lab, (320, 200), (40, 30), 0, 0, 360, 3, -1)
        return lab

    def test_extract_openeds_sample(self):
        lab = self._label_map()
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, lab.shape, np.uint8)
        b = ArchiveBuilder("OpenEDS", "OpenEDS_t")
        ok = extract_openeds_sample(b, img, lab, "im0.png")
        assert ok and len(b) == 1
        assert b.images[0].shape == (H, W)
        # fitted pupil center lands near the (crop+resize-transformed) GT
        pup = b.fits_pupil[0]
        assert abs(pup[0] - 320.0) < 6.0
        assert set(np.unique(b.masks_noskin[0])) <= {0, 2, 3}
        assert b.masks[0].shape == (H, W)  # original label map, resized

    def test_openeds_rejects_labels_without_pupil(self):
        lab = np.zeros((400, W), np.uint8)
        cv2.circle(lab, (320, 200), 160, 1, -1)
        rng = np.random.RandomState(0)
        b = ArchiveBuilder("OpenEDS", "OpenEDS_t")
        ok = extract_openeds_sample(b, rng.randint(0, 255, lab.shape, np.uint8),
                                    lab, "im1.png")
        assert not ok and len(b) == 0


class TestRITEyes:
    def _renders(self):
        nsk = np.zeros((H, W, 3), np.uint8)
        cv2.circle(nsk, (320, 240), 170, (0, 0, 255), -1)           # sclera blue
        cv2.ellipse(nsk, (320, 240), (110, 90), 0, 0, 360, (0, 255, 0), -1)
        cv2.ellipse(nsk, (320, 240), (45, 35), 0, 0, 360, (255, 0, 0), -1)
        wsk = nsk.copy()
        wsk[:60] = 0  # skin band (dark in the with-skin render)
        return wsk, nsk

    def test_quantize_masks(self):
        wsk, nsk = self._renders()
        inskin, noskin = quantize_riteyes_masks(wsk, nsk)
        assert noskin[240, 320] == 3          # pupil
        assert noskin[240, 320 + 70] == 2     # iris ring
        assert noskin[240, 320 + 140] == 1    # sclera
        assert noskin[10, 10] == 0            # background
        assert np.all(inskin[:60] == 0)       # skin cleared

    def test_extract_riteyes_sample(self):
        wsk, nsk = self._renders()
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (H, W), np.uint8)
        b = ArchiveBuilder("riteyes_general", "riteyes_general_1")
        assert extract_riteyes_sample(b, img, wsk, nsk, "0001")
        pup = b.fits_pupil[0]
        assert abs(pup[0] - 320.0) < 4.0 and abs(pup[1] - 240.0) < 4.0
        assert abs(pup[2] - 45.0) < 5.0 or abs(pup[3] - 45.0) < 5.0


class TestSelections:
    def test_matches_reference_structure(self, tmp_path):
        sel = dataset_selections()
        # reference datasetSelections_histo.py:6-24
        assert sel["train"]["LPW"] == ["LPW_2500"]
        assert sel["test"]["NVGaze"] == ["NVIDIAAR_11200"]
        assert sel["train"]["riteyes_general"] == [
            f"riteyes_general_{i + 1}" for i in range(24)]
        assert sel["test"]["riteyes_general"] == ["riteyes_general_24"]

        from eghmd_tpu.data.generation import write_dataset_selections

        p = str(tmp_path / "dataset_selections.pkl")
        write_dataset_selections(p)
        with open(p, "rb") as f:
            assert pickle.load(f) == sel


class TestSplitsWorkflow:
    """The full offline flow: archives + .mat keys -> datasetSelections ->
    cond_<DS>.pkl -> driver datasets (the reference's unpickled split
    objects, train.py:86-94 / test.py:271-274)."""

    def _build_archive(self, tmp_path, name, n=300, seed=0):
        from eghmd_tpu.data.generation import ArchiveBuilder

        rng = np.random.RandomState(seed)
        b = ArchiveBuilder(name.split("_")[0], name)
        for i in range(n):
            img = rng.randint(0, 255, (48, 64), np.uint8)
            mask = np.zeros((48, 64), np.int8)
            mask[10:40, 15:50] = 1
            mask[18:32, 25:40] = 2
            mask[22:28, 29:36] = 3
            pc = [rng.uniform(0.15 * 64, 0.85 * 64), rng.uniform(0.15 * 48, 0.85 * 48)]
            pup = [pc[0], pc[1], 4.0, 3.0, 0.1]
            iri = [pc[0], pc[1], 9.0, 8.0, 0.05]
            b.add(img, mask, mask, str(i), pc, pup, iri)
        return b.save(str(tmp_path / "Histogram"), str(tmp_path / "Histogram_mat"))

    def test_make_splits_to_driver_datasets(self, tmp_path):
        from cli.make_splits import main as make_splits_main
        from eghmd_tpu.data.curriculum import datasets_from_split, load_split
        from eghmd_tpu.data.generation import write_dataset_selections

        self._build_archive(tmp_path, "LPW_2500", n=300, seed=0)
        self._build_archive(tmp_path, "LPW_11200", n=200, seed=1)
        sel_pkl = str(tmp_path / "dataset_selections.pkl")
        write_dataset_selections(sel_pkl)

        out = make_splits_main([
            "--path2mat", str(tmp_path / "Histogram_mat"), "--curObj", "LPW",
            "--selections", sel_pkl, "--mode", "vanilla", "--notest", "0",
            "--out", str(tmp_path / "leaveoneout" / "cond_LPW.pkl"),
        ])
        split = load_split(out)
        assert set(map(str, split.arch)) == {"LPW_2500", "LPW_11200"}
        f0 = split.folds[0]
        total = sum(len(f0[k]) for k in ("train_idx", "valid_idx", "test_idx"))
        assert total > 400  # border-10% pruning removes some entries

        train, valid, test = datasets_from_split(
            split, archives_dir=str(tmp_path / "Histogram"),
            size=(48, 64), scale=None)
        assert len(train) == len(f0["train_idx"])
        s = train[0]
        assert s.image.shape == (48, 64, 1)
        assert not s.cond.any()

    def test_driver_consumes_cond_pkl(self, tmp_path):
        from cli.args import build_datasets, parse_args
        from cli.make_splits import main as make_splits_main

        self._build_archive(tmp_path, "Solo_2500", n=250, seed=2)
        make_splits_main([
            "--path2mat", str(tmp_path / "Histogram_mat"), "--curObj", "Solo",
            "--mode", "vanilla", "--notest", "0",
            "--out", str(tmp_path / "leaveoneout" / "cond_Solo.pkl"),
        ])
        args = parse_args([
            "--curObj", "Solo", "--path2data", str(tmp_path / "Histogram"),
            "--test_mode", str(tmp_path / "leaveoneout"),
            "--image_height", "48", "--image_width", "64",
        ])
        train, valid, test = build_datasets(args)
        assert len(train) > 0 and len(valid) > 0 and len(test) > 0
        assert train[0].image.shape[2] == 1
