"""Augmentation and curriculum-split parity vs the reference oracle.

Closes the two largest previously-untested modules: mode-by-mode
augmentation parity with seeded RNG (reference data_augment.py:12-130) and
stratification/split semantics (reference CurriculumLib.py:276-390).
"""

import numpy as np
import pytest

from eghmd_tpu.data.augment import augment
from eghmd_tpu.data.curriculum import (
    generate_file_list,
    generate_strat_indices,
    rm_entries,
)

from reference_oracle import import_reference

cv2 = pytest.importorskip("cv2")


def _sample(seed=0, h=96, w=128):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w)).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    cv2.circle(mask, (w // 2, h // 2), 30, 1, -1)
    cv2.circle(mask, (w // 2, h // 2), 18, 2, -1)
    cv2.circle(mask, (w // 2, h // 2), 8, 3, -1)
    pupil_c = np.array([w / 2 + 3.0, h / 2 - 2.0])
    pupil_p = np.array([w / 2 + 3.0, h / 2 - 2.0, 8.0, 6.0, 0.4])
    iris_p = np.array([w / 2.0, h / 2.0, 18.0, 15.0, -0.2])
    return img, mask, pupil_c, (pupil_p, iris_p)


class TestAugmentParity:
    @pytest.mark.parametrize("choice", list(range(8)))
    def test_mode_parity_with_reference(self, choice):
        """Same seeded RNG stream -> bit-identical images, masks and
        co-transformed annotations for every mode."""
        ref = import_reference("data_augment")
        img, mask, pc, (pp, ip) = _sample()

        np.random.seed(100 + choice)
        r_img, r_mask, r_pc, (r_pp, r_ip) = ref.augment(
            img.copy(), mask.copy(), pc.copy(), (pp.copy(), ip.copy()),
            choice=choice)

        rng = np.random.RandomState(100 + choice)
        o_img, o_mask, o_pc, (o_pp, o_ip) = augment(
            img.copy(), mask.copy(), pc.copy(), (pp.copy(), ip.copy()),
            rng=rng, choice=choice)

        np.testing.assert_array_equal(o_img, r_img, err_msg=f"mode {choice} image")
        np.testing.assert_array_equal(o_mask.astype(np.uint8),
                                      np.asarray(r_mask).astype(np.uint8),
                                      err_msg=f"mode {choice} mask")
        np.testing.assert_allclose(o_pc, np.asarray(r_pc, np.float64).reshape(-1),
                                   rtol=1e-12, err_msg=f"mode {choice} center")
        np.testing.assert_allclose(o_pp, np.asarray(r_pp, np.float64).reshape(-1),
                                   rtol=1e-12, err_msg=f"mode {choice} pupil")
        np.testing.assert_allclose(o_ip, np.asarray(r_ip, np.float64).reshape(-1),
                                   rtol=1e-12, err_msg=f"mode {choice} iris")

    @pytest.mark.parametrize("choice", [0, 6])
    def test_missing_annotations_pass_through(self, choice):
        img, mask, _, _ = _sample(1)
        bad = -np.ones(5)
        rng = np.random.RandomState(0)
        _, _, pc, (pp, ip) = augment(img, mask, -np.ones(2), (bad, bad),
                                     rng=rng, choice=choice)
        if choice == 0:  # flip leaves missing annotations untouched
            np.testing.assert_array_equal(pc, -np.ones(2))
            np.testing.assert_array_equal(pp, bad)
        else:  # rotation co-rotates centers even when -1 (reference behavior,
            # data_augment.py:116-120) but angles stay -1
            assert pp[-1] == -1 and ip[-1] == -1

    def test_flip_geometry(self):
        img, mask, pc, (pp, ip) = _sample(2)
        rng = np.random.RandomState(0)
        _, m2, pc2, (pp2, ip2) = augment(img, mask, pc, (pp, ip), rng=rng, choice=0)
        w = img.shape[1]
        assert pc2[0] == w - pc[0]
        assert pp2[-1] == -pp[-1]
        np.testing.assert_array_equal(np.asarray(m2), np.fliplr(mask))

    def test_rotation_keeps_point_on_ellipse(self):
        img, mask, pc, (pp, ip) = _sample(3)
        rng = np.random.RandomState(7)
        _, m2, pc2, (pp2, ip2) = augment(img, mask, pc, (pp, ip), rng=rng, choice=6)
        # rotated pupil center must coincide with the rotated param center
        np.testing.assert_allclose(pc2, pp2[:2], atol=1e-9)
        # mask rotated with NEAREST keeps the label set
        assert set(np.unique(m2)) <= set(np.unique(mask))


def _make_all_ds(seed=0, n_per=400, archives=("A_2500", "B_2500", "C_11200")):
    rng = np.random.RandomState(seed)
    rows = {"archive": [], "pupil_loc": [], "dataset": [], "im_num": [], "subset": []}
    for a in archives:
        pl = rng.uniform(0.05, 0.95, (n_per, 2))
        pl[rng.rand(n_per) < 0.05] = -1.0  # some missing pupil centers
        rows["pupil_loc"].append(pl)
        rows["archive"].append(np.repeat(a, n_per))
        rows["dataset"].append(np.repeat(a.split("_")[0], n_per))
        rows["subset"].append(np.repeat(a, n_per))
        rows["im_num"].append(np.arange(n_per))
    return {k: np.concatenate(v, 0) for k, v in rows.items()}


class TestStratIndices:
    def test_parity_with_reference(self):
        ref = import_reference("CurriculumLib")
        all_ds = _make_all_ds()
        ref_indx, ref_ds = ref.generate_strat_indices(
            {k: v.copy() for k, v in all_ds.items()})
        indx, ds = generate_strat_indices({k: v.copy() for k, v in all_ds.items()})
        np.testing.assert_array_equal(indx, ref_indx)
        np.testing.assert_array_equal(ds["im_num"], ref_ds["im_num"])
        np.testing.assert_array_equal(ds["archive"], ref_ds["archive"])
        np.testing.assert_allclose(ds["pupil_loc"], ref_ds["pupil_loc"])

    def test_border_pupils_dropped_missing_kept(self):
        all_ds = _make_all_ds()
        all_ds["pupil_loc"][0] = [0.02, 0.5]   # border -> dropped
        all_ds["pupil_loc"][1] = [-1.0, -1.0]  # missing -> kept
        indx, ds = generate_strat_indices(all_ds)
        assert len(indx) == len(ds["im_num"])
        kept = set(map(tuple, np.stack([ds["im_num"],
                                        np.arange(len(ds["im_num"])) * 0], 1)))
        assert not np.any((ds["pupil_loc"][:, 0] > 0) &
                          ((ds["pupil_loc"][:, 0] < 0.10) |
                           (ds["pupil_loc"][:, 0] > 0.90)))

    def test_small_strata_removed(self):
        all_ds = _make_all_ds(n_per=60)
        indx, ds = generate_strat_indices(all_ds)
        _, counts = np.unique(indx, return_counts=True)
        assert np.all(counts > 5)


class TestFileList:
    def test_vanilla_notest(self):
        split = generate_file_list(_make_all_ds(), mode="vanilla", notest=True)
        f = split.folds[0]
        n = len(f["train_idx"]) + len(f["valid_idx"])
        assert len(f["test_idx"]) == 0
        # 80/20 stratified split (reference: test_size=0.2)
        assert abs(len(f["valid_idx"]) / n - 0.2) < 0.02
        tr = set(map(tuple, f["train_idx"]))
        va = set(map(tuple, f["valid_idx"]))
        assert not tr & va and len(tr | va) == n

    def test_vanilla_with_test(self):
        split = generate_file_list(_make_all_ds(), mode="vanilla", notest=False)
        f = split.folds[0]
        total = sum(len(f[k]) for k in ("train_idx", "valid_idx", "test_idx"))
        tr = set(map(tuple, f["train_idx"]))
        va = set(map(tuple, f["valid_idx"]))
        te = set(map(tuple, f["test_idx"]))
        assert not (tr & va) and not (tr & te) and not (va & te)
        assert abs(len(te) / total - 0.2) < 0.02

    def test_foldk(self):
        split = generate_file_list(_make_all_ds(), mode="fold4", notest=False)
        assert len(split.folds) == 4
        test0 = set(map(tuple, split.folds[0]["test_idx"]))
        all_valid = set()
        train_n = None
        for f in split.folds:
            va = set(map(tuple, f["valid_idx"]))
            tr = set(map(tuple, f["train_idx"]))
            assert not va & all_valid  # validation folds are disjoint
            all_valid |= va
            assert not (tr | va) & test0  # test stays held out
            train_n = len(tr) + len(va) if train_n is None else train_n
            assert len(tr) + len(va) == train_n
        assert len(all_valid) == train_n  # folds cover the train portion

    def test_none_mode(self):
        all_ds = _make_all_ds()
        split = generate_file_list(all_ds, mode="none")
        f = split.folds[0]
        np.testing.assert_array_equal(f["train_idx"], f["test_idx"])
        np.testing.assert_array_equal(f["train_idx"], f["valid_idx"])

    def test_deterministic_under_seed(self):
        a = generate_file_list(_make_all_ds(), mode="vanilla", seed=3)
        b = generate_file_list(_make_all_ds(), mode="vanilla", seed=3)
        np.testing.assert_array_equal(a.folds[0]["train_idx"],
                                      b.folds[0]["train_idx"])
