"""BDCN self-training recipe: boundary supervision, balanced BCE, trainer.

The reference ships neither BDCN weights nor BDCN training code
(train.py:126-127 loads a missing blob); training/bdcn_train.py makes the
edge stage producible in-repo. These tests pin the supervision derivation,
the class-balance math, and that a short run actually learns edges.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.data import DataPipeline, SyntheticEyeDataset
from eghmd_tpu.models.bdcn import BDCN
from eghmd_tpu.training import (BDCNTrainer, boundary_map_from_labels,
                                bdcn_loss, class_balanced_bce, edge_f1,
                                load_bdcn_checkpoint)


class TestBoundaryMap:
    def test_marks_both_sides_of_contour(self):
        lab = np.zeros((1, 8, 8), np.int32)
        lab[0, :, 4:] = 1  # vertical contour between cols 3 and 4
        y = np.asarray(boundary_map_from_labels(jnp.asarray(lab), dilate=0))
        assert y.shape == (1, 8, 8, 1)
        np.testing.assert_array_equal(y[0, :, 3, 0], 1.0)
        np.testing.assert_array_equal(y[0, :, 4, 0], 1.0)
        np.testing.assert_array_equal(y[0, :, :3, 0], 0.0)
        np.testing.assert_array_equal(y[0, :, 5:, 0], 0.0)

    def test_dilate_grows_band(self):
        lab = np.zeros((1, 9, 9), np.int32)
        lab[0, 4:, :] = 2
        y0 = np.asarray(boundary_map_from_labels(jnp.asarray(lab), dilate=0))
        y1 = np.asarray(boundary_map_from_labels(jnp.asarray(lab), dilate=1))
        assert y1.sum() > y0.sum()
        assert np.all(y1 >= y0)

    def test_uniform_labels_no_edges(self):
        lab = np.full((2, 8, 8), 2, np.int32)
        y = np.asarray(boundary_map_from_labels(jnp.asarray(lab)))
        assert y.sum() == 0.0


class TestBalancedBCE:
    def test_confident_correct_prediction_near_zero(self):
        y = (np.random.RandomState(0).rand(2, 16, 16, 1) < 0.05).astype(np.float32)
        logit = jnp.asarray(np.where(y > 0, 20.0, -20.0))
        loss = float(class_balanced_bce(logit, jnp.asarray(y)))
        assert loss < 1e-6

    def test_balance_weights_make_all_negative_costly(self):
        """With ~2% positives, predicting 'no edge everywhere' must cost
        more than predicting the true map — plain BCE would not guarantee
        this at strong confidence asymmetries."""
        rng = np.random.RandomState(1)
        y = (rng.rand(1, 32, 32, 1) < 0.02).astype(np.float32)
        all_neg = jnp.full(y.shape, -10.0)
        correct = jnp.asarray(np.where(y > 0, 10.0, -10.0))
        l_neg = float(class_balanced_bce(all_neg, jnp.asarray(y)))
        l_cor = float(class_balanced_bce(correct, jnp.asarray(y)))
        assert l_neg > 50 * max(l_cor, 1e-12)

    def test_total_loss_weighs_all_eleven_outputs(self):
        y = jnp.zeros((1, 8, 8, 1))
        outs = [jnp.zeros((1, 8, 8, 1)) for _ in range(11)]
        base = float(bdcn_loss(outs, y))
        # zero logits on all-negative target: per-output loss is
        # w_neg * softplus(0) with w_neg = 1.1 * 0 = 0 -> exactly 0
        assert base == 0.0
        y1 = jnp.ones((1, 8, 8, 1))
        l1 = float(bdcn_loss(outs, y1))
        # all-positive target: w_pos = 0 -> 0 as well (degenerate balance)
        assert l1 == 0.0
        ymix = jnp.asarray((np.arange(64).reshape(1, 8, 8, 1) % 2)
                           .astype(np.float32))
        lmix = float(bdcn_loss(outs, ymix))
        sides = 10 * 0.5
        fuse = 1.1
        expect = (sides + fuse) * float(class_balanced_bce(outs[0], ymix))
        np.testing.assert_allclose(lmix, expect, rtol=1e-6)


class TestEdgeF1:
    def test_perfect_prediction(self):
        y = (np.random.RandomState(2).rand(1, 16, 16, 1) < 0.1).astype(np.float32)
        m = jax.device_get(edge_f1(jnp.asarray(y), jnp.asarray(y)))
        assert float(m["f1"]) == pytest.approx(1.0)

    def test_threshold_is_downstream_convention(self):
        y = np.zeros((1, 4, 4, 1), np.float32)
        y[0, 0, 0, 0] = 1.0
        prob = np.full((1, 4, 4, 1), 0.11, np.float32)  # all >= 0.1
        m = jax.device_get(edge_f1(jnp.asarray(prob), jnp.asarray(y)))
        assert float(m["recall"]) == pytest.approx(1.0)
        assert float(m["precision"]) == pytest.approx(1.0 / 16.0)


@pytest.mark.slow
def test_bdcn_learns_synthetic_edges(tmp_path):
    """A short run on tiny synthetic images must cut the loss and reach a
    clearly-better-than-chance F1, and the checkpoint must round-trip into
    build_edge_fn's loader."""
    ds = SyntheticEyeDataset(16, (64, 96), aug=False, seed=4)
    pipe = DataPipeline(ds, batch_size=4, shuffle=True, num_workers=2)
    trainer = BDCNTrainer(lr=1e-3, dilate=1)
    params, history = trainer.fit(pipe, epochs=8,
                                  checkpoint_dir=str(tmp_path))
    assert history[-1]["loss"] < history[0]["loss"] * 0.85, history
    assert history[-1]["f1"] > 0.25, history

    variables = load_bdcn_checkpoint(str(tmp_path))
    model = BDCN()
    batch = next(iter(pipe))
    fuse = model.apply(variables, jnp.repeat(batch["image"], 3, axis=-1))[-1]
    assert fuse.shape == batch["image"].shape
    assert np.all(np.isfinite(np.asarray(fuse)))
