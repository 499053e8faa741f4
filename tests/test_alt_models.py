"""Alternative model families: structural parity vs the torch reference.

RITnet v1 / DeepVOG / RITnet_concat were previously untested; these tests
pin their architectures to the reference via trainable-parameter counts and
exercise the forward contracts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.config import VARIANT_PRESETS
from eghmd_tpu.models import DeepVOG, RITnetConcat, RITnetV1, deepvog_loss

from reference_oracle import import_reference

torch = pytest.importorskip("torch")


def _count_torch(model, exclude=("dsIdentify",)):
    return sum(int(np.prod(p.shape)) for n, p in model.named_parameters()
               if not any(e in n for e in exclude))


def _count_flax(variables):
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables["params"])[0]:
        total += int(np.prod(leaf.shape))
    return total


class TestRITnetV1:
    def test_param_count_matches_reference(self):
        ref = import_reference("models.RITnet_v1")
        tm = ref.DenseNet2D(dropout=True, prob=0.2)
        model = RITnetV1()
        # the regressor's flatten is sized for the 240x320 operating point
        x = jnp.zeros((1, 240, 320, 1))
        variables = jax.jit(lambda r: model.init(r, x, x, train=False))(
            jax.random.PRNGKey(0))
        assert _count_flax(variables) == _count_torch(tm)

    def test_forward_contract(self):
        model = RITnetV1()
        x = jnp.ones((2, 176, 192, 1)) * 0.1
        variables = jax.jit(lambda r: model.init(r, x, x, train=False))(
            jax.random.PRNGKey(0))
        op, el_out, latent = jax.jit(lambda v: model.apply(v, x, x, train=False))(variables)
        assert op.shape == (2, 176, 192, 3)
        assert el_out.shape == (2, 10)
        assert np.all(np.isfinite(np.asarray(op)))


class TestDeepVOG:
    def test_param_count_matches_reference(self):
        ref = import_reference("models.deepvog_pytorch")
        tm = ref.DeepVOG_pytorch()
        model = DeepVOG()
        x = jnp.zeros((1, 176, 192, 1))
        variables = jax.jit(lambda r: model.init(r, x, x, train=False))(
            jax.random.PRNGKey(0))
        # the reference's up_block5 constructs a DEAD conv2/bn2 (forward
        # skips them when up_sampling=False, deepvog_pytorch.py:46-81);
        # our model omits the dead parameters
        n_ref = _count_torch(tm, exclude=("up_block5.conv2", "up_block5.bn2"))
        assert _count_flax(variables) == n_ref

    def test_forward_and_loss(self):
        model = DeepVOG()
        x = jnp.ones((2, 176, 192, 1)) * 0.1
        variables = jax.jit(lambda r: model.init(r, x, x, train=False))(
            jax.random.PRNGKey(0))
        op, el_out, latent = jax.jit(lambda v: model.apply(v, x, x, train=False))(variables)
        assert op.shape[-1] in (2, 3)
        target = jnp.zeros((2, 176, 192), jnp.int32)
        pc = jnp.full((2, 2), 88.0)
        loss, pred_c = deepvog_loss(op, target, pc, jnp.zeros((2, 4)))
        assert np.isfinite(float(loss))
        assert pred_c.shape == (2, 2)


class TestRITnetConcat:
    def test_param_count_matches_reference(self):
        ref = import_reference("models.RITnet_concat")
        setting = {"add_seg": 0, "seg_detach": 0, "add_edge": 1,
                   "edge_thres": 0, "add_selayer": 0, "generate_eyeball": 0,
                   "feature_channels": 153, "style_dim": 8,
                   "input_concat": 0, "only_edge": 0}
        tm = ref.DenseNet2D(setting)
        model = RITnetConcat()
        # the regressor's flatten is sized for the 240x320 operating point
        x = jnp.zeros((1, 240, 320, 1))
        variables = jax.jit(lambda r: model.init(r, x, x, train=False))(
            jax.random.PRNGKey(0))
        assert _count_flax(variables) == _count_torch(tm)

    def test_forward_contract(self):
        model = RITnetConcat()
        x = jnp.ones((2, 176, 192, 1)) * 0.1
        e = jnp.ones((2, 176, 192, 1)) * 0.5
        variables = jax.jit(lambda r: model.init(r, x, e, train=False))(
            jax.random.PRNGKey(0))
        op, el_out, latent = jax.jit(lambda v: model.apply(v, x, e, train=False))(variables)
        assert op.shape == (2, 176, 192, 3)
        assert el_out.shape == (2, 10)


NHWC = lambda a: np.transpose(np.asarray(a), (0, 2, 3, 1))


def _close(a, b, rel=1e-3):
    # scale-aware tolerance (see test_esfnet_parity): random-init activation
    # magnitudes grow with depth, so agreement is relative to the output scale
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rel,
                               atol=rel * np.abs(np.asarray(b)).max() + 1e-6)


class TestNumericParity:
    """Random-weight forward parity through the checkpoint converters."""

    def test_ritnet_v1_forward_parity(self):
        ref = import_reference("models.RITnet_v1")
        from eghmd_tpu.utils.torch_convert import ritnet_v1_torch_to_flax

        torch.manual_seed(3)
        tm = ref.DenseNet2D()
        tm.eval()
        B, H, W = 2, 240, 320
        rng = np.random.RandomState(0)
        img = rng.rand(B, 1, H, W).astype(np.float32)
        target = torch.from_numpy(rng.randint(0, 3, (B, H, W)).astype(np.int64))
        with torch.no_grad():
            op, el_pred, latent, loss, el_out = tm(
                torch.from_numpy(img), torch.from_numpy(img), target,
                torch.zeros(B, 2), torch.zeros(B, 2, 5), torch.zeros(B, H, W),
                torch.zeros(B, 3, H, W), torch.zeros(B, 4),
                torch.zeros(B, dtype=torch.long), 0.5)

        variables = jax.tree.map(jnp.asarray, ritnet_v1_torch_to_flax(tm.state_dict()))
        x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
        op_f, el_f, lat_f = jax.jit(lambda v: RITnetV1().apply(v, x, x, train=False))(variables)
        _close(np.asarray(op_f), NHWC(op.numpy()))
        _close(np.asarray(el_f), el_out.numpy())

    def test_deepvog_forward_parity(self):
        ref = import_reference("models.deepvog_pytorch")
        from eghmd_tpu.utils.torch_convert import deepvog_torch_to_flax

        torch.manual_seed(4)
        tm = ref.DeepVOG_pytorch()
        tm.eval()
        B, H, W = 2, 240, 320
        rng = np.random.RandomState(1)
        img = rng.rand(B, 1, H, W).astype(np.float32)
        target = torch.from_numpy(rng.randint(0, 3, (B, H, W)).astype(np.int64))
        with torch.no_grad():
            out, el_pred, emb, loss, _ = tm(
                torch.from_numpy(img), torch.from_numpy(img), target,
                torch.zeros(B, 2), torch.zeros(B, 2, 5), torch.zeros(B, H, W),
                torch.zeros(B, 3, H, W), torch.zeros(B, 4),
                torch.zeros(B, dtype=torch.long), 0.5)

        variables = jax.tree.map(jnp.asarray, deepvog_torch_to_flax(tm.state_dict()))
        x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
        op_f, _, _ = jax.jit(lambda v: DeepVOG().apply(v, x, x, train=False))(variables)
        _close(np.asarray(op_f), NHWC(out.numpy()))

    def test_ritnet_concat_forward_parity(self):
        ref = import_reference("models.RITnet_concat")
        from eghmd_tpu.utils.torch_convert import ritnet_concat_torch_to_flax

        setting = {"add_seg": 0, "seg_detach": 0, "add_edge": 1,
                   "edge_thres": 0, "add_selayer": 0, "generate_eyeball": 0,
                   "feature_channels": 153, "style_dim": 8,
                   "input_concat": 0, "only_edge": 0}
        torch.manual_seed(5)
        tm = ref.DenseNet2D(setting)
        tm.eval()
        B, H, W = 2, 240, 320
        rng = np.random.RandomState(2)
        img = rng.rand(B, 1, H, W).astype(np.float32)
        edge = rng.rand(B, 1, H, W).astype(np.float32)
        target = torch.from_numpy(rng.randint(0, 3, (B, H, W)).astype(np.int64))
        with torch.no_grad():
            op, el_pred, latent, loss, el_out = tm(
                torch.from_numpy(img), torch.from_numpy(edge), target,
                torch.zeros(B, 2), torch.zeros(B, 2, 5), torch.zeros(B, H, W),
                torch.zeros(B, 3, H, W), torch.zeros(B, 4),
                torch.zeros(B, dtype=torch.long), 0.5)

        variables = jax.tree.map(jnp.asarray,
                                 ritnet_concat_torch_to_flax(tm.state_dict()))
        x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
        e = jnp.asarray(np.transpose(edge, (0, 2, 3, 1)))
        op_f, el_f, lat_f = jax.jit(lambda v: RITnetConcat().apply(v, x, e, train=False))(variables)
        _close(np.asarray(op_f), NHWC(op.numpy()))
        _close(np.asarray(el_f), el_out.numpy())
        _close(np.asarray(lat_f), latent.numpy())


class TestDeepVOGIntegration:
    """DeepVOG trains and evaluates through the generic drivers via its own
    loss (the generic 3-class loss cannot consume its 2-channel logits)."""

    @pytest.mark.slow  # compiles a trainer on the 1-CPU mesh
    def test_train_step_and_eval(self):
        from eghmd_tpu.config import ExperimentConfig
        from eghmd_tpu.data import SyntheticEyeDataset, DataPipeline
        from eghmd_tpu.parallel import make_mesh, batch_sharding
        from eghmd_tpu.training import Trainer

        cfg = ExperimentConfig(model="deepvog", setting="baseline", epochs=1,
                               batchsize=8, image_size=(176, 192),
                               disentangle=False)
        trainer = Trainer(cfg, DeepVOG(), log_fn=None)
        mesh = make_mesh()
        ds = SyntheticEyeDataset(8, (176, 192), seed=5)
        pipe = DataPipeline(ds, 8, sharding=batch_sharding(mesh),
                            shuffle=False, num_workers=2)
        b = next(iter(pipe))
        state = trainer.init_state(b)
        state, m = trainer.train_step(state, b, 0.5)
        assert np.isfinite(float(m["loss"]))
        ev, _ = trainer.eval_step(state.params, state.batch_stats, b, 0.0)
        assert np.isfinite(float(ev["loss"]))
