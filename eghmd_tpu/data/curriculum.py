"""Dataset curriculum: archive keys, selection, stratified splits.

Counterpart of reference CurriculumLib.py:197-441: reading .mat master keys
(``readArchives``), dataset/subset selection, stratified index generation
from a 5x5 2-D histogram of pupil centers x archive (``generate_strat_indices``),
and train/valid/test file-list generation ('vanilla' / 'foldK' / 'none' modes,
``generate_fileList`` / ``Datasplit``).
"""

from __future__ import annotations

import copy
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def simple_string(ele):
    """Lower-case alnum-only canonicalization (reference helperfunctions.py:394-404)."""
    if isinstance(ele, (list, np.ndarray)):
        return [simple_string(e) for e in ele]
    return "".join(ch.lower() for ch in str(ele) if ch.isalnum())


def extract_datasets(subsets):
    """Archive names -> (unique dataset prefixes, per-entry dataset ids).

    Reference helperfunctions.py:480-486: dataset id = text before the first
    underscore of the archive name.
    """
    ds_idx = [str(e).split("_")[0] for e in np.asarray(subsets).reshape(-1)]
    ds_present, ds_id = np.unique(ds_idx, return_inverse=True)
    return ds_present, ds_id


def read_archives(path2arc_keys: str) -> Dict[str, np.ndarray]:
    """Load .mat master keys into one concatenated table.

    Reference CurriculumLib.py:203-235 (``readArchives``): per image —
    archive name, image number, relative pupil location, dataset, subset.
    """
    import scipy.io as scio

    all_ds = {"archive": [], "pupil_loc": [], "dataset": [], "im_num": [], "subset": []}
    for chunk in sorted(os.listdir(path2arc_keys)):
        if not chunk.endswith(".mat"):
            continue
        data = scio.loadmat(os.path.join(path2arc_keys, chunk))
        n = np.size(data["archive"])
        pupil_loc = data["pupil_loc"]
        if not np.size(data.get("subset", [])):
            data["subset"] = "none"
        if isinstance(pupil_loc, list) or not np.size(pupil_loc):
            pupil_loc = -np.ones((n, 2))
        loc = np.arange(n)
        res = np.flip(np.asarray(data["resolution"]), axis=1)
        all_ds["im_num"].append(loc)
        all_ds["archive"].append(np.asarray(data["archive"]).reshape(-1)[loc])
        all_ds["pupil_loc"].append(pupil_loc[loc, :] / res[loc, :])
        all_ds["dataset"].append(np.repeat(data["dataset"], n))
        all_ds["subset"].append(np.repeat(data["subset"], n))
    return {k: np.concatenate(v, axis=0) for k, v in all_ds.items()}


def _select(all_ds, keep_mask):
    return {k: v[keep_mask] for k, v in all_ds.items()}


def sel_dataset(all_ds, sel):
    """Keep listed datasets (reference CurriculumLib.py:250-261)."""
    sel = set(simple_string(list(np.atleast_1d(sel))))
    mask = np.array([simple_string(d) in sel for d in all_ds["dataset"]])
    return _select(all_ds, mask)


def sel_subset(all_ds, sel):
    """Keep listed subsets (reference CurriculumLib.py:263-270)."""
    sel = set(simple_string(list(np.atleast_1d(sel))))
    mask = np.array([simple_string(s) in sel for s in all_ds["subset"]])
    return _select(all_ds, mask)


def rm_dataset(all_ds, rm):
    """Drop listed datasets (reference CurriculumLib.py:237-248)."""
    rm = set(simple_string(list(np.atleast_1d(rm))))
    mask = np.array([simple_string(d) not in rm for d in all_ds["dataset"]])
    return _select(all_ds, mask)


def generate_strat_indices(all_ds, bins=5, border=0.1, min_bin=5):
    """Stratification bins from pupil-center position x archive.

    Reference CurriculumLib.py:285-325: 2-D histogram (bins x bins) of the
    relative pupil centers per archive; entries in the border 10% or in bins
    with <= min_bin members are dropped (index -1); each (archive, spatial
    bin) pair becomes one stratum.
    """
    pupil = np.asarray(all_ds["pupil_loc"], np.float64)
    archive = np.asarray(all_ds["archive"])
    arch_names, arch_id = np.unique(archive, return_inverse=True)

    edges = np.linspace(border, 1.0 - border, bins + 1)
    xb = np.digitize(pupil[:, 0], edges) - 1
    yb = np.digitize(pupil[:, 1], edges) - 1
    in_range = (xb >= 0) & (xb < bins) & (yb >= 0) & (yb < bins)
    has_pupil = ~np.all(pupil == -1, axis=1)
    spatial = np.where(in_range, yb * bins + xb, -1)
    # entries without pupil annotation get their own per-archive stratum
    strat = np.where(
        has_pupil & (spatial >= 0),
        arch_id * (bins * bins + 1) + spatial,
        np.where(~has_pupil, arch_id * (bins * bins + 1) + bins * bins, -1),
    )
    # drop tiny bins
    vals, counts = np.unique(strat[strat >= 0], return_counts=True)
    small = set(vals[counts <= min_bin].tolist())
    strat = np.where(np.isin(strat, list(small)), -1, strat)
    return strat, arch_names, arch_id


@dataclass
class DataSplit:
    """Train/valid/test index lists over archives (reference Datasplit,
    CurriculumLib.py:416-441). ``folds[k]`` maps 'train_idx'/'valid_idx'/
    'test_idx' to [N, 2] (im_num, archive_idx) arrays; ``arch`` holds the
    archive name per index."""

    arch: np.ndarray
    folds: List[Dict[str, np.ndarray]] = field(default_factory=list)


def generate_file_list(all_ds, mode="vanilla", test_frac=0.2, valid_frac=0.1,
                       n_folds=5, seed=0) -> DataSplit:
    """Build stratified train/valid/test lists.

    Reference CurriculumLib.py:327-390 (``generate_fileList``): 'vanilla'
    makes one stratified train/valid/test split, 'foldK' stratified K folds,
    'none' puts everything in test.
    """
    strat, arch_names, arch_id = generate_strat_indices(all_ds)
    im_num = np.asarray(all_ds["im_num"], np.int64)
    entries = np.stack([im_num, arch_id], axis=1)
    valid_mask = strat >= 0
    entries_v = entries[valid_mask]
    strat_v = strat[valid_mask]

    split = DataSplit(arch=arch_names)
    rng = np.random.RandomState(seed)

    if mode == "none":
        split.folds.append({"train_idx": entries[:0], "valid_idx": entries[:0],
                            "test_idx": entries})
        return split

    def strat_split(idx, strata, frac):
        """Stratified holdout: per stratum, hold out round(frac * n)."""
        hold, keep = [], []
        for s in np.unique(strata):
            members = idx[strata == s]
            members = members[rng.permutation(len(members))]
            k = int(round(frac * len(members)))
            hold.append(members[:k])
            keep.append(members[k:])
        return np.concatenate(keep), np.concatenate(hold)

    base = np.arange(len(entries_v))
    if mode == "vanilla":
        trainval, test = strat_split(base, strat_v, test_frac)
        train, valid = strat_split(trainval, strat_v[trainval], valid_frac / (1 - test_frac))
        split.folds.append({
            "train_idx": entries_v[train],
            "valid_idx": entries_v[valid],
            "test_idx": entries_v[test],
        })
    elif mode == "foldK":
        order = rng.permutation(len(base))
        fold_of = np.zeros(len(base), np.int64)
        for s in np.unique(strat_v):
            members = np.where(strat_v == s)[0]
            members = members[rng.permutation(len(members))]
            fold_of[members] = np.arange(len(members)) % n_folds
        for k in range(n_folds):
            test = base[fold_of == k]
            trainval = base[fold_of != k]
            train, valid = strat_split(trainval, strat_v[trainval], valid_frac)
            split.folds.append({
                "train_idx": entries_v[train],
                "valid_idx": entries_v[valid],
                "test_idx": entries_v[test],
            })
    else:
        raise ValueError(f"unknown split mode {mode!r}")
    return split


def make_splits(archives: Sequence[str], size=(480, 640), scale=0.5,
                aug_train=True, test_frac=0.2, valid_frac=0.1, seed=0):
    """Convenience: H5 archives -> (train, valid, test) datasets with a
    stratified-by-archive random split (no .mat keys needed)."""
    import h5py

    from .h5dataset import H5EyeDataset

    rows = []
    for ai, path in enumerate(archives):
        with h5py.File(path, "r") as f:
            n = f["Images"].shape[0]
        rows.append(np.stack([np.arange(n), np.full(n, ai), np.full(n, ai)], 1))
    table = np.concatenate(rows, 0)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(table))
    n_test = int(round(test_frac * len(table)))
    n_valid = int(round(valid_frac * len(table)))
    test_idx = order[:n_test]
    valid_idx = order[n_test:n_test + n_valid]
    train_idx = order[n_test + n_valid:]
    mk = lambda idx, aug: H5EyeDataset(list(archives), im_list=table[idx],
                                       size=size, scale=scale, aug=aug)
    return mk(train_idx, aug_train), mk(valid_idx, False), mk(test_idx, False)
