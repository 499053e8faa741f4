"""BDCN numeric parity against the torch reference (random weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.models.bdcn import BDCN, bilinear_upsample_kernel, make_edge_fn
from eghmd_tpu.utils.torch_convert import bdcn_torch_to_flax

from reference_oracle import import_reference


def test_bilinear_kernel_matches_reference():
    ref = import_reference("bdcn_new")
    for k in (4, 8, 16):
        ref_w = ref.get_upsampling_weight(1, 1, k).numpy()[0, 0]
        ours = np.asarray(bilinear_upsample_kernel(k))[:, :, 0, 0]
        np.testing.assert_allclose(ours, ref_w, rtol=1e-6)


def test_bdcn_forward_parity():
    ref_mod = import_reference("bdcn_new")
    import torch

    torch.manual_seed(0)
    model = ref_mod.BDCN()
    model.eval()
    rng = np.random.RandomState(5)
    x = rng.randn(1, 3, 96, 128).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in model(torch.from_numpy(x))]

    variables = jax.tree.map(jnp.asarray, bdcn_torch_to_flax(model.state_dict()))
    outs = jax.jit(lambda v, a: BDCN().apply(v, a))(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    assert len(outs) == 11
    for i, (ours, ref) in enumerate(zip(outs, ref_outs)):
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5, err_msg=f"map {i}")


def test_param_coverage():
    ref_mod = import_reference("bdcn_new")
    import torch

    model = ref_mod.BDCN()
    variables = bdcn_torch_to_flax(model.state_dict())
    n_flax = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    n_torch = sum(int(np.prod(v.shape)) for k, v in model.state_dict().items()
                  if "upsample" not in k)
    assert n_flax == n_torch


def test_edge_fn_shapes_and_threshold():
    model = BDCN()
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 96, 128, 1))
    variables = model.init(rng, jnp.concatenate([img] * 3, axis=-1))
    edge_fn = make_edge_fn(variables)
    e = jax.jit(edge_fn)(img)
    assert e.shape == (2, 96, 128, 1)
    assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0


def test_edge_fn_fast_mode_consistency():
    """downscale=2 == manual downsample -> BDCN -> upsample (wiring check),
    and the thresholded maps (edge_thres configs binarize at 0.1,
    reference utils.py:653-655) stay close to the full-res maps."""
    model = BDCN()
    rng = jax.random.PRNGKey(1)
    img = jax.nn.sigmoid(jax.random.normal(rng, (2, 96, 128, 1)))
    x3_small = jnp.concatenate([jax.image.resize(img, (2, 48, 64, 1), "bilinear")] * 3, -1)
    variables = model.init(rng, x3_small)

    fast = jax.jit(make_edge_fn(variables, downscale=2))(img)
    manual = jax.image.resize(model.apply(variables, x3_small)[-1],
                              (2, 96, 128, 1), "bilinear")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(manual),
                               rtol=1e-5, atol=1e-6)
    assert fast.shape == (2, 96, 128, 1)
    assert float(fast.min()) >= 0.0 and float(fast.max()) <= 1.0


def test_edge_fn_fast_mode_snaps_to_pool_alignment():
    """downscale that would break BDCN's 3 stride-2 pools (240/4 = 60) snaps
    the reduced dims up to the nearest multiple of 8 (64x80)."""
    model = BDCN()
    rng = jax.random.PRNGKey(2)
    img = jax.nn.sigmoid(jax.random.normal(rng, (1, 240, 320, 1)))
    variables = model.init(rng, jnp.zeros((1, 64, 80, 3)))
    e = jax.jit(make_edge_fn(variables, downscale=4))(img)
    assert e.shape == (1, 240, 320, 1)
    assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0
