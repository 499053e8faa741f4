"""Loss-stack parity against the torch reference on identical random inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.losses import (
    surface_loss,
    generalized_dice_loss,
    weighted_ce_loss,
    seg_loss,
    seg_to_pt_loss,
    pt_loss,
    conf_loss,
    self_consistency_loss,
    compute_all_losses,
    el_pred_from_seg_centers,
)

from reference_oracle import import_reference

B, H, W, C = 4, 48, 64, 3
RNG = np.random.RandomState(42)


def make_inputs(mask_pattern):
    op = RNG.randn(B, C, H, W).astype(np.float32) * 3
    target = RNG.randint(0, 3, (B, H, W)).astype(np.int64)
    # ensure all classes present per sample (reference wCE requirement)
    target[:, 0, 0], target[:, 0, 1], target[:, 0, 2] = 0, 1, 2
    spat = (1 + 20 * RNG.rand(B, H, W)).astype(np.float32)
    dist = RNG.randn(B, C, H, W).astype(np.float32)
    pupil_center = RNG.uniform(10, 40, (B, 2)).astype(np.float32)
    el_norm = RNG.uniform(-0.5, 0.5, (B, 2, 5)).astype(np.float32)
    el_norm[:, :, 2:4] = RNG.uniform(0.2, 0.6, (B, 2, 2))
    el_out = RNG.uniform(-0.5, 0.5, (B, 10)).astype(np.float32)
    el_out[:, 2:4] = RNG.uniform(0.2, 0.6, (B, 2))
    el_out[:, 7:9] = RNG.uniform(0.2, 0.6, (B, 2))
    cond = np.zeros((B, 4), np.float32)
    cond[:, 1] = mask_pattern
    return op, target, spat, dist, pupil_center, el_norm, el_out, cond


def to_jax(op, target, spat, dist):
    return (
        jnp.asarray(np.transpose(op, (0, 2, 3, 1))),
        jnp.asarray(target.astype(np.int32)),
        jnp.asarray(spat),
        jnp.asarray(np.transpose(dist, (0, 2, 3, 1))),
    )


class TestComponents:
    def test_surface_loss_parity(self):
        loss_ref = import_reference("loss")
        import torch

        op, target, spat, dist, *_ = make_inputs([0, 0, 0, 0])
        ref = loss_ref.SurfaceLoss(torch.from_numpy(op), torch.from_numpy(dist))
        j_op, _, _, j_dist = to_jax(op, target, spat, dist)
        ours = surface_loss(j_op, j_dist)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_gdice_parity(self):
        loss_ref = import_reference("loss")
        import torch
        import torch.nn.functional as F

        op, target, spat, dist, *_ = make_inputs([0, 0, 0, 0])
        j_op, j_target, _, _ = to_jax(op, target, spat, dist)
        ours = np.asarray(generalized_dice_loss(j_op, j_target))
        for i in range(B):
            ref = loss_ref.GDiceLoss(
                torch.from_numpy(op[i: i + 1]),
                torch.from_numpy(target[i: i + 1]),
                F.softmax,
            )
            np.testing.assert_allclose(ours[i], ref.item(), rtol=1e-5, atol=1e-6)

    def test_gdice_absent_class(self):
        """A sample whose target lacks a class must zero that class weight."""
        loss_ref = import_reference("loss")
        import torch
        import torch.nn.functional as F

        op = RNG.randn(1, C, H, W).astype(np.float32)
        target = RNG.randint(0, 2, (1, H, W)).astype(np.int64)  # no class 2
        ref = loss_ref.GDiceLoss(torch.from_numpy(op), torch.from_numpy(target), F.softmax)
        ours = generalized_dice_loss(
            jnp.asarray(np.transpose(op, (0, 2, 3, 1))), jnp.asarray(target.astype(np.int32))
        )
        np.testing.assert_allclose(np.asarray(ours)[0], ref.item(), rtol=1e-5, atol=1e-6)

    def test_wce_parity(self):
        loss_ref = import_reference("loss")
        import torch

        op, target, spat, dist, *_ = make_inputs([0, 0, 0, 0])
        j_op, j_target, j_spat, _ = to_jax(op, target, spat, dist)
        ours = np.asarray(weighted_ce_loss(j_op, j_target, j_spat))
        for i in range(B):
            ref = loss_ref.wCE(
                torch.from_numpy(op[i]), torch.from_numpy(target[i]), torch.from_numpy(spat[i])
            )
            np.testing.assert_allclose(ours[i], ref.item(), rtol=1e-5, atol=1e-6)

    def test_seg2pt_parity(self):
        loss_ref = import_reference("loss")
        import torch

        op, target, spat, dist, pupil_center, *_ = make_inputs([0, 0, 0, 0])
        gt = RNG.uniform(-1, 1, (B, 2)).astype(np.float32)
        ref_l, ref_p = loss_ref.get_seg2ptLoss(
            torch.from_numpy(op[:, 2]), torch.from_numpy(gt), temperature=4
        )
        ours_l, ours_p = seg_to_pt_loss(
            jnp.asarray(op[:, 2]), jnp.asarray(gt), temperature=4.0
        )
        np.testing.assert_allclose(np.asarray(ours_p), ref_p.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours_l), ref_l.numpy(), rtol=1e-4, atol=1e-5)

    def test_ptloss_parity(self):
        loss_ref = import_reference("loss")
        import torch

        x = RNG.randn(B, 10).astype(np.float32)
        y = RNG.randn(B, 10).astype(np.float32)
        for mask in ([1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 1]):
            m = np.asarray(mask, np.float32)
            ref = loss_ref.get_ptLoss(torch.from_numpy(x), torch.from_numpy(y),
                                      torch.from_numpy(m))
            ref = ref.item() if hasattr(ref, "item") else ref
            ours = pt_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m))
            np.testing.assert_allclose(float(ours), ref, rtol=1e-5, atol=1e-7)

    def test_conf_loss_parity(self):
        loss_ref = import_reference("loss")
        import torch

        x = RNG.randn(B, 4).astype(np.float32)
        ids = RNG.randint(0, 4, (B,))
        ref = loss_ref.conf_Loss(torch.from_numpy(x), torch.from_numpy(ids), True)
        ours = conf_loss(jnp.asarray(x), jnp.asarray(ids), True)
        np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)
        ref2 = loss_ref.conf_Loss(torch.from_numpy(x), torch.from_numpy(ids), False)
        ours2 = conf_loss(jnp.asarray(x), jnp.asarray(ids), False)
        np.testing.assert_allclose(float(ours2), ref2.item(), rtol=1e-5)

    def test_self_consistency_parity(self):
        loss_ref = import_reference("loss")
        import torch

        op, target, spat, dist, pupil_center, el_norm, el_out, cond = make_inputs([0, 0, 1, 0])
        el_pred = RNG.uniform(-0.3, 0.3, (B, 10)).astype(np.float32)
        el_pred[:, 2:4] = RNG.uniform(0.3, 0.7, (B, 2))
        el_pred[:, 7:9] = RNG.uniform(0.3, 0.7, (B, 2))
        mask_valid = 1 - cond[:, 1]
        ref = loss_ref.get_selfConsistency(
            torch.from_numpy(op), torch.from_numpy(el_pred), torch.from_numpy(mask_valid)
        )
        ours = self_consistency_loss(
            jnp.asarray(np.transpose(op, (0, 2, 3, 1))), jnp.asarray(el_pred),
            jnp.asarray(mask_valid),
        )
        np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-4, atol=1e-6)


class TestAllLoss:
    @pytest.mark.parametrize("mask_pattern", [[0, 0, 0, 0], [1, 0, 1, 0], [1, 1, 1, 1]])
    def test_get_allloss_parity(self, mask_pattern):
        ref_mod = import_reference("models.RITnet_v2")
        import torch

        op, target, spat, dist, pupil_center, el_norm, el_out, cond = make_inputs(mask_pattern)
        ref_total, ref_pred_c = ref_mod.get_allLoss(
            torch.from_numpy(op), torch.from_numpy(el_out), torch.from_numpy(target),
            torch.from_numpy(pupil_center), torch.from_numpy(el_norm),
            torch.from_numpy(spat), torch.from_numpy(dist), torch.from_numpy(cond),
            torch.zeros(B), 0.37,
        )
        j_op, j_target, j_spat, j_dist = to_jax(op, target, spat, dist)
        out = compute_all_losses(
            j_op, jnp.asarray(el_out), j_target, jnp.asarray(pupil_center),
            jnp.asarray(el_norm), j_spat, j_dist, jnp.asarray(cond), 0.37,
        )
        np.testing.assert_allclose(float(out.total), float(ref_total), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.pred_c_seg), ref_pred_c.detach().numpy(), rtol=1e-4, atol=1e-5
        )
        # elPred fusion (reference models/RITnet_v2.py:334-335)
        ref_el_pred = torch.cat(
            [ref_pred_c[:, 0, :], torch.from_numpy(el_out)[:, 2:5],
             ref_pred_c[:, 1, :], torch.from_numpy(el_out)[:, 7:10]], dim=1)
        ours_el_pred = el_pred_from_seg_centers(out.pred_c_seg, jnp.asarray(el_out))
        np.testing.assert_allclose(
            np.asarray(ours_el_pred), ref_el_pred.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_jit_and_grad(self):
        """The full loss must jit and differentiate (no python branches)."""
        op, target, spat, dist, pupil_center, el_norm, el_out, cond = make_inputs([1, 0, 1, 0])
        j_op, j_target, j_spat, j_dist = to_jax(op, target, spat, dist)

        @jax.jit
        def f(o, e):
            return compute_all_losses(
                o, e, j_target, jnp.asarray(pupil_center), jnp.asarray(el_norm),
                j_spat, j_dist, jnp.asarray(cond), 0.5,
            ).total

        g_op, g_el = jax.grad(f, argnums=(0, 1))(j_op, jnp.asarray(el_out))
        assert np.all(np.isfinite(np.asarray(g_op)))
        assert np.all(np.isfinite(np.asarray(g_el)))
