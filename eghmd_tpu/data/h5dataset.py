"""HDF5 dataset reader/writer matching the reference archive schema.

Schema (reference CurriculumLib.py:168-195 reader, helperfunctions.py:627-659
writer): ``Images [N,H,W] u8``, ``Masks_noSkin [N,H,W]`` (0 bg / 1 sclera /
2 iris / 3 pupil), ``Fits/pupil [N,5]``, ``Fits/iris [N,5]`` (cx,cy,a,b,rad),
``pupil_loc [N,2]``. Missing annotation groups are empty datasets; per-sample
missing annotations are -1 sentinels. The 4-bool ``cond`` is derived exactly
like the reference (1 = MISSING): [pupil_center, mask, pupil_fit, iris_fit].
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

os.environ.setdefault("HDF5_USE_FILE_LOCKING", "FALSE")  # reference CurriculumLib.py:28

from .sample import Sample, assemble_sample


def write_h5_archive(path, images, masks_noskin=None, pupil_fits=None,
                     iris_fits=None, pupil_locs=None):
    """Create an archive in the reference schema (for tests / dataset gen)."""
    import h5py

    n = len(images)
    with h5py.File(path, "w") as f:
        f.create_dataset("Images", data=np.asarray(images, np.uint8))
        f.create_dataset(
            "Masks_noSkin",
            data=(np.asarray(masks_noskin) if masks_noskin is not None
                  else np.zeros((0,), np.int8)),
        )
        fits = f.create_group("Fits")
        fits.create_dataset(
            "pupil",
            data=(np.asarray(pupil_fits, np.float64) if pupil_fits is not None
                  else np.zeros((0,), np.float64)),
        )
        fits.create_dataset(
            "iris",
            data=(np.asarray(iris_fits, np.float64) if iris_fits is not None
                  else np.zeros((0,), np.float64)),
        )
        f.create_dataset(
            "pupil_loc",
            data=(np.asarray(pupil_locs, np.float64) if pupil_locs is not None
                  else np.zeros((0,), np.float64)),
        )
        f.create_dataset("Info", data=np.arange(n))


class H5EyeDataset:
    """Random-access dataset over one or more reference-format H5 archives.

    ``im_list`` rows are (im_num, archive_idx, dataset_id) — the same triplet
    layout the reference threads through ``imList`` (CurriculumLib.py:53-54).
    """

    def __init__(self, archives: Sequence[str], im_list: Optional[np.ndarray] = None,
                 size: Tuple[int, int] = (480, 640), scale: Optional[float] = 0.5,
                 aug: bool = False, seed: int = 0):
        import h5py

        self.archives = list(archives)
        self._h5py = h5py
        self._files = [None] * len(self.archives)
        if im_list is None:
            rows = []
            for ai, path in enumerate(self.archives):
                with h5py.File(path, "r") as f:
                    n = f["Images"].shape[0]
                rows.append(np.stack([np.arange(n), np.full(n, ai), np.full(n, ai)], 1))
            im_list = np.concatenate(rows, 0)
        self.im_list = np.asarray(im_list, np.int64)
        self.size = size
        self.scale = scale
        self.aug = aug
        self.seed = seed

    def __len__(self):
        return self.im_list.shape[0]

    def _file(self, idx):
        if self._files[idx] is None:
            self._files[idx] = self._h5py.File(self.archives[idx], "r")
        return self._files[idx]

    def read_raw(self, idx):
        """Partial-read one record (reference CurriculumLib.py:168-195)."""
        im_num, arch_num, ds_id = self.im_list[idx]
        f = self._file(int(arch_num))
        img = f["Images"][im_num]
        pupil_center = (f["pupil_loc"][im_num] if f["pupil_loc"].shape[0] else -np.ones(2))
        mask = (f["Masks_noSkin"][im_num] if f["Masks_noSkin"].shape[0]
                else -np.ones(img.shape[:2]))
        pupil_param = (f["Fits"]["pupil"][im_num] if f["Fits"]["pupil"].shape[0]
                       else -np.ones(5))
        iris_param = (f["Fits"]["iris"][im_num] if f["Fits"]["iris"].shape[0]
                      else -np.ones(5))
        cond = np.array([
            np.all(pupil_center == -1),
            np.all(mask == -1) or np.all(mask == 0),
            np.all(pupil_param == -1),
            np.all(iris_param == -1),
        ])
        info = np.array([im_num, arch_num, ds_id], np.int32)
        return img, mask, iris_param, pupil_param, pupil_center, cond, info

    def __getitem__(self, idx) -> Sample:
        img, mask, iris_p, pupil_p, pupil_c, cond, info = self.read_raw(idx)
        rng = np.random.RandomState((self.seed * 1000003 + idx) % (2 ** 31))
        mask = np.where(mask < 0, 0, mask)
        return assemble_sample(
            img, mask.astype(np.int64), iris_p, pupil_p, pupil_c, cond,
            im_info=info, size=self.size, scale=self.scale, aug=self.aug, rng=rng,
        )
