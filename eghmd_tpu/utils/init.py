"""Reference weight-initialization schemes as param-tree transforms.

The reference initializes ESF-Net inside the model constructor
(models/RITnet_v2.py:356-369: He-normal convs with fan = k*k*out_channels,
normal(0, 0.01) linears, zero biases, unit BatchNorm scales) and ships a
generic xavier initializer (pytorchtools.py:70-83). Flax's defaults differ
(lecun_normal); these transforms re-draw an initialized param tree with the
reference's distributions so training-from-scratch matches the reference's
starting statistics.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _reinit_leaf_reference(key, path, leaf):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape, dtype = leaf.shape, leaf.dtype
    if name == "kernel" and leaf.ndim == 4:       # conv HWIO: He, fan k*k*out
        n = shape[0] * shape[1] * shape[3]
        return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / n)
    if name == "kernel" and leaf.ndim == 2:       # linear: normal(0, 0.01)
        return jax.random.normal(key, shape, dtype) * 0.01
    if name == "bias":
        return jnp.zeros(shape, dtype)
    if name == "scale":                           # norm scales stay 1
        return jnp.ones(shape, dtype)
    return leaf


def _reinit_leaf_xavier(key, path, leaf):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape, dtype = leaf.shape, leaf.dtype
    if name == "kernel" and leaf.ndim >= 2:
        if leaf.ndim == 4:
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        else:
            fan_in, fan_out = shape[0], shape[1]
        std = np.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std
    if name == "bias":
        return jnp.zeros(shape, dtype)
    return leaf


def _apply(params, rng, fn):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))
    return jax.tree_util.tree_unflatten(
        treedef, [fn(k, p, leaf) for k, (p, leaf) in zip(keys, flat)])


def reference_model_init(params, rng):
    """He-normal convs / normal(0, 0.01) linears / zero biases — the
    reference model constructor's scheme (models/RITnet_v2.py:356-369)."""
    return _apply(params, rng, _reinit_leaf_reference)


def xavier_weights_init(params, rng):
    """xavier_normal weights / zero biases (reference pytorchtools.py:70-83)."""
    return _apply(params, rng, _reinit_leaf_xavier)


INIT_SCHEMES = {
    "flax": lambda params, rng: params,
    "reference": reference_model_init,
    "xavier": xavier_weights_init,
}
