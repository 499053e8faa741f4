"""Dataset curriculum: archive keys, selection, stratified splits.

Counterpart of reference CurriculumLib.py:197-441: reading .mat master keys
(``readArchives``), dataset/subset selection, stratified index generation
from a 5x5 2-D histogram of pupil centers x archive (``generate_strat_indices``),
and train/valid/test file-list generation ('vanilla' / 'foldK' / 'none' modes,
``generate_fileList`` / ``Datasplit``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

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


def rm_entries(all_ds, drop_mask):
    """Drop rows by boolean mask (reference CurriculumLib.py:276-283)."""
    return {k: v[~drop_mask] for k, v in all_ds.items()}


def generate_strat_indices(all_ds, bins=5, min_bin=5):
    """Stratification bins from pupil-center position x archive.

    Reference CurriculumLib.py:285-325 semantics, step for step:
      1. drop entries whose pupil center lies in the border 10% of either
         axis (entries with NEGATIVE / missing pupil centers are kept);
      2. 2-D histogram of the remaining relative pupil centers with
         DATA-DEPENDENT edges (np.histogramdd, 5 bins per axis);
      3. right-inclusive digitize into those edges (missing pupils land in
         bin 0);
      4. stratum id = ravel_multi_index((binx, biny, archive)), min-shifted;
      5. iteratively drop strata with <= min_bin members.

    Returns (strat_idx, pruned_all_ds).
    """
    pupil = np.asarray(all_ds["pupil_loc"], np.float64)
    o_bounds = np.sum((pupil < 0.10) | (pupil > 0.90), axis=1).astype(bool)
    n_exist = np.sum(pupil < 0, axis=1).astype(bool)
    all_ds = rm_entries(all_ds, o_bounds & ~n_exist)

    _, (x_edges, y_edges) = np.histogramdd(
        np.asarray(all_ds["pupil_loc"], np.float64), bins=bins)
    arch_id = np.unique(all_ds["archive"], return_inverse=True)[1]
    binx = np.digitize(all_ds["pupil_loc"][:, 0], x_edges, right=True)
    biny = np.digitize(all_ds["pupil_loc"][:, 1], y_edges, right=True)
    indx = np.ravel_multi_index(
        (binx, biny, arch_id), (bins + 1, bins + 1, int(np.max(arch_id)) + 1))
    indx = indx - np.min(indx)

    vals, counts = np.unique(indx, return_counts=True)
    for rm_ind in vals[counts <= min_bin]:
        ent = indx == rm_ind
        indx = indx[~ent]
        all_ds = rm_entries(all_ds, ent)
    return indx, all_ds


@dataclass
class DataSplit:
    """Train/valid/test index lists over archives (reference Datasplit,
    CurriculumLib.py:416-441). ``folds[k]`` maps 'train_idx'/'valid_idx'/
    'test_idx' to [N, 2] (im_num, archive_idx) arrays; ``arch`` holds the
    archive name per index."""

    arch: np.ndarray
    folds: List[Dict[str, np.ndarray]] = field(default_factory=list)


def generate_file_list(all_ds, mode="vanilla", notest=True, seed=0) -> DataSplit:
    """Build stratified train/valid/test lists.

    Reference CurriculumLib.py:327-390 (``generate_fileList``) semantics via
    the same sklearn machinery:
      * 'vanilla' (or 'vanilla<P>' with a train percentage): optional
        stratified train/test split (skipped when ``notest``), then a
        stratified 80/20 train/valid split;
      * 'fold<K>': stratified 80/20 train/test split, then StratifiedKFold
        over the train portion for per-fold train/valid;
      * 'none': everything in train, valid AND test.
    A ``seed`` is threaded through sklearn's random_state (the reference
    leaves it unseeded) so splits are reproducible.
    """
    import re

    from sklearn.model_selection import StratifiedKFold, train_test_split

    indx, all_ds = generate_strat_indices(all_ds)
    arch_names = np.unique(all_ds["archive"])
    arch_id = np.unique(all_ds["archive"], return_inverse=True)[1]
    im_num = np.asarray(all_ds["im_num"], np.int64)
    feats = np.stack([im_num, arch_id, indx], axis=1)
    valid_perc = 0.20

    split = DataSplit(arch=arch_names)

    if "vanilla" in mode:
        params = re.findall(r"\d+", mode)
        train_perc = float(params[0]) / 100 if len(params) == 1 else 1 - valid_perc
        if not notest:
            train_feats, test_feats = train_test_split(
                feats, train_size=train_perc, stratify=indx, random_state=seed)
        else:
            train_feats, test_feats = feats, feats[:0]
        train_feats, valid_feats = train_test_split(
            train_feats, test_size=0.2, stratify=train_feats[:, -1],
            random_state=seed)
        split.folds.append({"train_idx": train_feats[:, :2],
                            "valid_idx": valid_feats[:, :2],
                            "test_idx": test_feats[:, :2]})
    elif "fold" in mode:
        k = int(re.findall(r"\d+", mode)[0])
        train_feats, test_feats = train_test_split(
            feats, train_size=1 - valid_perc, stratify=indx, random_state=seed)
        skf = StratifiedKFold(n_splits=k, shuffle=True, random_state=seed)
        for train_loc, valid_loc in skf.split(train_feats, train_feats[:, -1]):
            split.folds.append({"train_idx": train_feats[train_loc, :2],
                                "valid_idx": train_feats[valid_loc, :2],
                                "test_idx": test_feats[:, :2]})
    elif "none" in mode:
        split.folds.append({"train_idx": feats[:, :2],
                            "valid_idx": feats[:, :2],
                            "test_idx": feats[:, :2]})
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


def datasets_from_split(split: DataSplit, archives_dir: str, fold: int = 0,
                        size=(480, 640), scale=0.5, aug_train=True):
    """DataSplit -> (train, valid, test) H5EyeDataset triple.

    Archive names resolve to ``<archives_dir>/<name>.h5``; each im_list row
    carries (im_num, archive_idx, dataset_id) where the dataset id comes
    from the archive-name prefix (reference helperfunctions.py:480-486).
    """
    from .h5dataset import H5EyeDataset

    arch_paths = [os.path.join(archives_dir, f"{str(a)}.h5") for a in split.arch]
    _, ds_id_per_arch = extract_datasets(split.arch)

    def mk(idx2, aug):
        if len(idx2) == 0:
            idx2 = np.zeros((0, 2), np.int64)
        ds_ids = ds_id_per_arch[np.asarray(idx2[:, 1], np.int64)] if len(idx2) \
            else np.zeros((0,), np.int64)
        im_list = np.stack([np.asarray(idx2[:, 0], np.int64),
                            np.asarray(idx2[:, 1], np.int64),
                            np.asarray(ds_ids, np.int64)], axis=1) if len(idx2) \
            else np.zeros((0, 3), np.int64)
        return H5EyeDataset(arch_paths, im_list=im_list, size=size,
                            scale=scale, aug=aug)

    f = split.folds[fold]
    return (mk(f["train_idx"], aug_train), mk(f["valid_idx"], False),
            mk(f["test_idx"], False))


def build_curriculum_split(path2arc_keys: str, cur_obj: str,
                           selections: Optional[Dict] = None,
                           mode: str = "vanilla", notest: bool = True,
                           seed: int = 0) -> DataSplit:
    """The reference's offline split-building flow (the ``cond_<DS>.pkl``
    objects train.py:86-94 / test.py:271-274 unpickle): read the .mat master
    keys, keep the datasetSelections subsets for ``cur_obj``, stratify and
    split."""
    all_ds = read_archives(path2arc_keys)
    if selections is not None:
        subs = list(selections["train"].get(cur_obj, []))
        subs += list(selections["test"].get(cur_obj, []))
        all_ds = sel_subset(all_ds, subs)
    else:
        all_ds = sel_dataset(all_ds, [cur_obj])
    return generate_file_list(all_ds, mode=mode, notest=notest, seed=seed)


def save_split(path: str, split: DataSplit):
    import pickle

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"arch": np.asarray(split.arch), "folds": split.folds}, f)


def load_split(path: str) -> DataSplit:
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    return DataSplit(arch=np.asarray(d["arch"]), folds=list(d["folds"]))
