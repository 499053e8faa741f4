"""Fused up-block Pallas kernel: parity vs the conv oracle (interpret mode).

The kernel is experimental on this round: numerically exact (tested here)
but not yet faster than XLA's conv fusions at 32-channel widths — kept as
the substrate for the space-to-depth serving path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.ops.pallas_dense_block import fused_up_block, _reference_up_block


def _params(rng, cu, cs, cc):
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.2, jnp.float32)
    return {
        "conv11": {"kernel": mk(1, 1, cu + cs, cc), "bias": mk(cc)},
        "conv12": {"kernel": mk(3, 3, cc, cc), "bias": mk(cc)},
        "conv21": {"kernel": mk(1, 1, cu + cs + cc, cc), "bias": mk(cc)},
        "conv22": {"kernel": mk(3, 3, cc, cc), "bias": mk(cc)},
    }


@pytest.mark.parametrize("shape", [(32, 48, 6, 5, 8), (16, 64, 30, 32, 16)])
def test_fused_up_block_parity(shape):
    h, w, cu, cs, cc = shape
    rng = np.random.RandomState(0)
    params = _params(rng, cu, cs, cc)
    u = jnp.asarray(rng.randn(2, h, w, cu), jnp.float32)
    s = jnp.asarray(rng.randn(2, h, w, cs), jnp.float32)
    out = fused_up_block(u, s, params, th=8, interpret=True)
    ref = _reference_up_block(u, s, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_up_block_matches_flax_module():
    from eghmd_tpu.models.blocks import DenseUpBlock, upsample2x_bilinear

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 6), jnp.float32)   # pre-upsample
    skip = jnp.asarray(rng.randn(2, 32, 48, 5), jnp.float32)
    mod = DenseUpBlock(8)
    variables = mod.init(jax.random.PRNGKey(0), skip, x)
    ref = mod.apply(variables, skip, x)
    out = fused_up_block(upsample2x_bilinear(x), skip, variables["params"],
                         th=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
