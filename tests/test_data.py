"""Data pipeline tests: sample assembly semantics, H5 schema round-trip,
synthetic GT consistency, and prefetching pipeline over a virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.data import (
    one_hot_to_dist,
    boundary_weights,
    pad_to_size,
    SyntheticEyeDataset,
    H5EyeDataset,
    write_h5_archive,
    DataPipeline,
    collate,
)
from eghmd_tpu.data.synthetic import render_eye, render_edge_map
from eghmd_tpu.geometry import norm_mat, transform_ellipse
from eghmd_tpu.metrics import rasterize_ellipse

from reference_oracle import import_reference


class TestHostOps:
    def test_one_hot_to_dist_parity(self):
        hf = import_reference("helperfunctions")
        rng = np.random.RandomState(0)
        mask = np.zeros((32, 48), bool)
        mask[8:20, 10:30] = True
        ref = hf.one_hot2dist(mask.copy())
        ours = one_hot_to_dist(mask)
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        # absent class -> zeros
        assert np.all(one_hot_to_dist(np.zeros((8, 8), bool)) == 0)

    def test_boundary_weights_range(self):
        lab = np.zeros((32, 48), np.uint8)
        lab[10:20, 15:35] = 2
        w = boundary_weights(lab)
        assert w.min() == 1.0 and w.max() == 21.0
        # boundary pixels upweighted
        assert w[10, 20] > 1.0

    def test_pad_to_size_parity(self):
        hf = import_reference("helperfunctions")
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (100, 120)).astype(np.uint8)
        mask = rng.randint(0, 4, (100, 120))
        iris = np.array([60.0, 50.0, 30.0, 20.0, 0.3])
        pupil = np.array([61.0, 51.0, 10.0, 8.0, 0.1])
        pc = np.array([61.0, 51.0])
        ri, rm, rpc, rel = hf.pad2Size(img.copy(), mask.copy(),
                                       [iris.copy(), pupil.copy()], pc.copy(), (120, 160))
        oi, om, oel, opc = pad_to_size(img, mask, [iris, pupil], pc, (120, 160))
        np.testing.assert_array_equal(oi, ri)
        np.testing.assert_array_equal(om, rm)
        np.testing.assert_allclose(opc, rpc)
        np.testing.assert_allclose(oel[0], rel[0])
        np.testing.assert_allclose(oel[1], rel[1])


class TestSynthetic:
    def test_sample_schema(self):
        ds = SyntheticEyeDataset(4, (240, 320))
        s = ds[0]
        assert s.image.shape == (240, 320, 1)
        assert s.target.shape == (240, 320)
        assert s.dist_map.shape == (240, 320, 3)
        assert s.el_norm.shape == (2, 5)
        assert set(np.unique(s.target)) <= {0, 1, 2}
        assert abs(float(s.image.mean())) < 1e-4  # standardized
        # normalized ellipse params respect b >= a canonicalization
        assert np.all(s.el_norm[:, 3] >= s.el_norm[:, 2])

    def test_gt_ellipse_matches_mask(self):
        """The normalized pupil ellipse must rasterize onto the pupil mask."""
        ds = SyntheticEyeDataset(2, (240, 320))
        s = ds[1]
        pup = rasterize_ellipse(jnp.asarray(s.el_norm[1]), 240, 320)
        seg = (s.target == 2).astype(np.float32)
        inter = float(jnp.sum(pup * seg))
        union = float(jnp.sum(jnp.maximum(pup, jnp.asarray(seg))))
        assert inter / union > 0.85, inter / union

    def test_missing_mask_cond(self):
        ds = SyntheticEyeDataset(8, (120, 160), missing_mask_frac=1.0)
        s = ds[0]
        assert s.cond.tolist() == [0.0, 1.0, 1.0, 1.0]
        assert np.all(s.el_norm == -1)

    def test_edge_map(self):
        ds = SyntheticEyeDataset(1, (240, 320))
        s = ds[0]
        e = render_edge_map(s.target)
        assert e.shape == (240, 320, 1)
        assert 0 <= e.min() and e.max() <= 1.0

    def test_degrade_keeps_gt_and_weakens_contrast(self):
        """degrade>0 compresses image contrast (the edge-guidance stress
        distribution) while labels/ellipses stay bit-identical, and the
        degradation is deterministic per (seed, idx)."""
        clean = SyntheticEyeDataset(2, (120, 160), seed=7, cache=False)
        hard = SyntheticEyeDataset(2, (120, 160), seed=7, cache=False,
                                   degrade=1.0)
        hard2 = SyntheticEyeDataset(2, (120, 160), seed=7, cache=False,
                                    degrade=1.0)
        c, h = clean[0], hard[0]
        np.testing.assert_array_equal(c.target, h.target)
        np.testing.assert_allclose(c.el_norm, h.el_norm)
        # per-image standardization fixes std=1, so assert raw-u8 contrast
        from eghmd_tpu.data.synthetic import degrade_image, render_eye

        rng = np.random.RandomState(3)
        raw = render_eye(rng, 120, 160)[0]
        deg = degrade_image(raw, np.random.RandomState(4), 1.0)
        assert float(deg.std()) < 0.7 * float(raw.std())
        assert not np.array_equal(c.image, h.image)
        np.testing.assert_array_equal(h.image, hard2[0].image)


class TestH5:
    def test_round_trip(self, tmp_path):
        rng = np.random.RandomState(0)
        imgs, masks, pfits, ifits, plocs = [], [], [], [], []
        for i in range(6):
            img, mask, ip, pp, pc = render_eye(rng, 480, 640)
            imgs.append(img)
            masks.append(mask)
            ifits.append(ip)
            pfits.append(pp)
            plocs.append(pc)
        path = str(tmp_path / "synth_6.h5")
        write_h5_archive(path, imgs, masks, pfits, ifits, plocs)
        ds = H5EyeDataset([path], size=(480, 640), scale=0.5)
        assert len(ds) == 6
        s = ds[2]
        assert s.image.shape == (240, 320, 1)
        assert s.cond.tolist() == [0.0, 0.0, 0.0, 0.0]
        # scaled pupil center must be half the stored one
        np.testing.assert_allclose(s.pupil_center, np.asarray(plocs[2]) * 0.5, atol=1e-3)

    def test_missing_groups(self, tmp_path):
        rng = np.random.RandomState(0)
        img, mask, *_ = render_eye(rng, 480, 640)
        path = str(tmp_path / "img_only.h5")
        write_h5_archive(path, [img])
        ds = H5EyeDataset([path], size=(480, 640), scale=0.5)
        s = ds[0]
        assert s.cond.tolist() == [1.0, 1.0, 1.0, 1.0]


class TestPipeline:
    def test_sharded_prefetch(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.array(jax.devices()[:8])
        mesh = Mesh(devs, ("data",))
        sharding = NamedSharding(mesh, P("data"))
        ds = SyntheticEyeDataset(16, (120, 160))
        pipe = DataPipeline(ds, batch_size=8, sharding=sharding, num_workers=4)
        batches = list(pipe)
        assert len(batches) == 2
        b = batches[0]
        assert b["image"].shape == (8, 120, 160, 1)
        assert b["image"].sharding.spec == P("data")
        assert b["cond"].shape == (8, 4)

    def test_collate_keys(self):
        ds = SyntheticEyeDataset(3, (120, 160))
        batch = collate([ds[i] for i in range(3)])
        from eghmd_tpu.data import SAMPLE_KEYS

        assert set(batch.keys()) == set(SAMPLE_KEYS)
