"""Import helpers for using the (read-only) PyTorch reference as a test oracle.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT written for
torch 1.2 / numpy 1.x / CUDA. We import selected modules purely as numeric
oracles for parity tests, with the minimal shims needed to run them on
CPU with modern numpy:
  * numpy 2.x removed the deprecated np.int / np.float / np.bool aliases;
  * skimage / deepdish are not installed (stubbed — the code paths we
    exercise never call them);
  * .cuda() calls are redirected to CPU no-ops.

If the reference tree is unavailable, tests using these oracles skip.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def _install_stubs():
    # numpy 1.x aliases used by the reference
    for name, val in (("int", int), ("float", float), ("bool", bool), ("object", object)):
        if not hasattr(np, name):
            setattr(np, name, val)

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        skimage.draw = types.ModuleType("skimage.draw")
        sys.modules["skimage"] = skimage
        sys.modules["skimage.draw"] = skimage.draw
    draw_mod = sys.modules["skimage.draw"]
    if not hasattr(draw_mod, "ellipse_perimeter"):
        # drawing-only helper used by reference generateImageGrid
        # (utils.py:316-343); outputs are overlay pixels, never metrics,
        # so an angle-sampled perimeter is a faithful stand-in
        def _ellipse_perimeter(r, c, r_radius, c_radius, orientation=0.0,
                               shape=None):
            t = np.linspace(0.0, 2 * np.pi, 720)
            co, so = np.cos(orientation), np.sin(orientation)
            ru = r_radius * np.cos(t)
            cu = c_radius * np.sin(t)
            rr = np.round(r + ru * co - cu * so).astype(np.int64)
            cc = np.round(c + cu * co + ru * so).astype(np.int64)
            if shape is not None:
                rr = rr.clip(0, shape[0] - 1)
                cc = cc.clip(0, shape[1] - 1)
            return rr, cc

        draw_mod.ellipse_perimeter = _ellipse_perimeter
    if "deepdish" not in sys.modules:
        sys.modules["deepdish"] = types.ModuleType("deepdish")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.make_grid = lambda *a, **k: a[0]
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils


def _patch_torch_cuda():
    import torch

    if getattr(torch, "_eghmd_cuda_patched", False):
        return
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch._eghmd_cuda_patched = True


def import_reference(module_name):
    """Import a module from the reference tree (e.g. 'helperfunctions')."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    _install_stubs()
    _patch_torch_cuda()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    # reference test.py bumps RLIMIT_NOFILE to 20480 at import
    # (test.py:27-28); this sandbox's hard limit is lower — no-op
    # setrlimit for the duration of the import (evaluate.py imports test)
    import resource

    orig_setrlimit = resource.setrlimit
    resource.setrlimit = lambda *a, **k: None
    try:
        return importlib.import_module(module_name)
    finally:
        resource.setrlimit = orig_setrlimit
