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
        op, el_out, latent = model.apply(variables, x, x, train=False)
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
        op, el_out, latent = model.apply(variables, x, x, train=False)
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
        op, el_out, latent = model.apply(variables, x, e, train=False)
        assert op.shape == (2, 176, 192, 3)
        assert el_out.shape == (2, 10)
