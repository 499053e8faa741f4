"""Convert reference PyTorch checkpoints to eghmd_tpu flax variables.

The reference ships torch state_dicts (`<model>_<ep>.pkl` with key
'state_dict', reference train.py:445-447; BDCN weights `gen_00000016.pt` with
key 'a', train.py:126-127). These converters map them onto our NHWC flax
module trees so trained reference weights can be served/evaluated on TPU and
so tests can verify numeric parity with randomly-initialized reference nets.

Layout rules:
  torch Conv2d weight [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
  torch Linear weight [O, I]         -> flax kernel [I, O]
  torch BatchNorm weight/bias        -> flax scale/bias (+ batch_stats)

No torch import is required: state_dicts may be passed as {name: np.ndarray}.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _lin_w(t):
    return np.asarray(t).T


def _as_numpy(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_conv(sd, params, tname, fpath, bias=True):
    _set(params, fpath + ("kernel",), _conv_w(sd[tname + ".weight"]))
    if bias:
        _set(params, fpath + ("bias",), np.asarray(sd[tname + ".bias"]))


def _convert_linear(sd, params, tname, fpath):
    _set(params, fpath + ("kernel",), _lin_w(sd[tname + ".weight"]))
    _set(params, fpath + ("bias",), np.asarray(sd[tname + ".bias"]))


def _convert_bn(sd, params, stats, tname, fpath):
    _set(params, fpath + ("scale",), np.asarray(sd[tname + ".weight"]))
    _set(params, fpath + ("bias",), np.asarray(sd[tname + ".bias"]))
    _set(stats, fpath + ("mean",), np.asarray(sd[tname + ".running_mean"]))
    _set(stats, fpath + ("var",), np.asarray(sd[tname + ".running_var"]))


def _convert_conv_block(sd, params, stats, tprefix, fprefix):
    _convert_conv(sd, params, tprefix + ".conv1", fprefix + ("conv1",))
    _convert_conv(sd, params, tprefix + ".conv2", fprefix + ("conv2",))
    _convert_bn(sd, params, stats, tprefix + ".bn", fprefix + ("bn",))


def _convert_down_block(sd, params, tprefix, fprefix):
    for name in ("conv1", "conv21", "conv22", "conv31", "conv32"):
        _convert_conv(sd, params, f"{tprefix}.{name}", fprefix + (name,))
    _convert_conv(sd, params, tprefix + ".TD.conv", fprefix + ("td_conv",))


def _convert_up_block(sd, params, tprefix, fprefix):
    for name in ("conv11", "conv12", "conv21", "conv22"):
        _convert_conv(sd, params, f"{tprefix}.{name}", fprefix + (name,))


def strip_module_prefix(sd):
    """Drop DataParallel 'module.' prefixes (reference pytorchtools.py:103-123)."""
    return { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }


def esfnet_torch_to_flax(state_dict, setting, include_ds_head=False):
    """Reference DenseNet2D (models/RITnet_v2.py:203-354) -> ESFNet variables."""
    sd = _as_numpy(strip_module_prefix(state_dict))
    params: dict = {}
    stats: dict = {}

    _convert_conv_block(sd, params, stats, "enc.head", ("enc", "head"))
    for i in range(1, 5):
        _convert_down_block(sd, params, f"enc.down_block{i}", ("enc", f"down_block{i}"))
    _convert_down_block(sd, params, "enc.bottleneck", ("enc", "bottleneck"))

    for i in (4, 3, 2, 1):
        _convert_up_block(sd, params, f"dec.up_block{i}", ("dec", f"up_block{i}"))
    _convert_conv_block(sd, params, stats, "dec.final", ("dec", "final"))

    _convert_conv(sd, params, "elReg.c1", ("elReg", "c1"))
    _convert_conv(sd, params, "elReg.c2", ("elReg", "c2"))
    _convert_conv(sd, params, "elReg.c3", ("elReg", "c3"), bias=False)
    _convert_linear(sd, params, "elReg.l1", ("elReg", "l1"))
    _convert_linear(sd, params, "elReg.l2", ("elReg", "l2"))

    if getattr(setting, "add_seg", 0):
        # StyleEncoder: model.0-4 are Conv2dBlocks, model.6 the 1x1 output conv
        for i in range(5):
            _convert_conv(sd, params, f"seg_encoder.model.{i}.conv",
                          ("seg_encoder", f"conv{i}"))
        _convert_conv(sd, params, "seg_encoder.model.6", ("seg_encoder", "conv_out"))
        for i in range(3):
            _convert_linear(sd, params, f"mlp.model.{i}.fc", ("mlp", f"fc{i}"))

    if include_ds_head and any(k.startswith("dsIdentify_lin") for k in sd):
        for i in range(2):
            _convert_linear(sd, params, f"dsIdentify_lin.layersLin.{i}",
                            ("dsIdentify_lin", f"lin{i}"))

    return {"params": params, "batch_stats": stats}


def load_reference_esfnet_checkpoint(path, setting):
    """Load a reference `<model>_<ep>.pkl` training checkpoint (torch pickle)."""
    import torch

    netdict = torch.load(path, map_location="cpu", weights_only=False)
    sd = netdict["state_dict"] if "state_dict" in netdict else netdict
    return esfnet_torch_to_flax(sd, setting)


def bdcn_torch_to_flax(state_dict):
    """Reference BDCN checkpoint ('gen_00000016.pt' key 'a', reference
    train.py:126-127) -> flax BDCN variables. Fixed bilinear upsample kernels
    are analytic constants in our module and are skipped (verified equal by
    tests)."""
    sd = _as_numpy(strip_module_prefix(state_dict))
    params: dict = {}

    # VGG16_C backbone
    for name in [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
        "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
        "conv5_3",
    ]:
        _convert_conv(sd, params, f"features.{name}", ("features", name))

    # MSBlocks + down convs + score heads per stage
    stage_blocks = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}
    for s, nb in stage_blocks.items():
        for j in range(1, nb + 1):
            for cname in ("conv", "conv1", "conv2", "conv3"):
                _convert_conv(sd, params, f"msblock{s}_{j}.{cname}",
                              (f"msblock{s}_{j}", cname))
            _convert_conv(sd, params, f"conv{s}_{j}_down", (f"conv{s}_{j}_down",))
        _convert_conv(sd, params, f"score_dsn{s}", (f"score_dsn{s}",))
        _convert_conv(sd, params, f"score_dsn{s}_1", (f"score_dsn{s}_1",))

    _convert_conv(sd, params, "fuse", ("fuse",))
    return {"params": params}


def load_reference_bdcn_checkpoint(path):
    """Load the reference's 'gen_00000016.pt' (torch pickle, key 'a')."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw["a"] if isinstance(raw, dict) and "a" in raw else raw
    return bdcn_torch_to_flax(sd)


def ritnet_v1_torch_to_flax(state_dict):
    """Reference RITNet v1 (models/RITnet_v1.py:193-260) -> RITnetV1 variables."""
    sd = _as_numpy(strip_module_prefix(state_dict))
    params: dict = {}
    stats: dict = {}
    for i in range(1, 6):
        t, f = f"enc.down_block{i}", (f"down_block{i}",)
        for name in ("conv1", "conv21", "conv22", "conv31", "conv32"):
            _convert_conv(sd, params, f"{t}.{name}", f + (name,))
        _convert_bn(sd, params, stats, f"{t}.bn", f + ("bn",))
    for i in (4, 3, 2, 1):
        t, f = f"dec.up_block{i}", (f"up_block{i}",)
        for name in ("conv11", "conv12", "conv21", "conv22"):
            _convert_conv(sd, params, f"{t}.{name}", f + (name,))
    _convert_conv(sd, params, "dec.final", ("final",))
    _convert_conv(sd, params, "elReg.c1", ("elReg", "c1"))
    _convert_conv(sd, params, "elReg.c2", ("elReg", "c2"))
    _convert_conv(sd, params, "elReg.c3", ("elReg", "c3"), bias=False)
    _convert_linear(sd, params, "elReg.l1", ("elReg", "l1"))
    _convert_linear(sd, params, "elReg.l2", ("elReg", "l2"))
    return {"params": params, "batch_stats": stats}


def deepvog_torch_to_flax(state_dict):
    """Reference DeepVOG (models/deepvog_pytorch.py:83-149) -> DeepVOG
    variables. up_block5's dead conv2/bn2 (never run: up_sampling=False)
    are skipped."""
    sd = _as_numpy(strip_module_prefix(state_dict))
    params: dict = {}
    stats: dict = {}
    for i in range(1, 5):
        t, f = f"down_block{i}", (f"down_block{i}",)
        _convert_conv(sd, params, f"{t}.conv1", f + ("conv1",))
        _convert_conv(sd, params, f"{t}.conv2", f + ("conv2",))
        _convert_bn(sd, params, stats, f"{t}.bn1", f + ("bn1",))
        _convert_bn(sd, params, stats, f"{t}.bn2", f + ("bn2",))
    for i in range(1, 6):
        t, f = f"up_block{i}", (f"up_block{i}",)
        _convert_conv(sd, params, f"{t}.conv1", f + ("conv1",))
        _convert_bn(sd, params, stats, f"{t}.bn1", f + ("bn1",))
        if i < 5:  # up_block5's conv2/bn2 are dead in the reference
            _convert_conv(sd, params, f"{t}.conv2", f + ("conv2",))
            _convert_bn(sd, params, stats, f"{t}.bn2", f + ("bn2",))
    _convert_conv(sd, params, "conv1", ("conv1",))
    return {"params": params, "batch_stats": stats}


def ritnet_concat_torch_to_flax(state_dict):
    """Reference RITnet_concat (models/RITnet_concat.py:182-260) ->
    RITnetConcat variables (shared v2-style encoder + dual-skip decoder)."""
    sd = _as_numpy(strip_module_prefix(state_dict))
    params: dict = {}
    stats: dict = {}
    _convert_conv_block(sd, params, stats, "enc.head", ("enc", "head"))
    for i in range(1, 5):
        _convert_down_block(sd, params, f"enc.down_block{i}",
                            ("enc", f"down_block{i}"))
    _convert_down_block(sd, params, "enc.bottleneck", ("enc", "bottleneck"))
    for i in (4, 3, 2, 1):
        _convert_up_block(sd, params, f"dec.up_block{i}", (f"up_block{i}",))
    _convert_conv_block(sd, params, stats, "dec.final", ("final",))
    _convert_conv(sd, params, "elReg.c1", ("elReg", "c1"))
    _convert_conv(sd, params, "elReg.c2", ("elReg", "c2"))
    _convert_conv(sd, params, "elReg.c3", ("elReg", "c3"), bias=False)
    _convert_linear(sd, params, "elReg.l1", ("elReg", "l1"))
    _convert_linear(sd, params, "elReg.l2", ("elReg", "l2"))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Inverse direction: flax -> reference torch state_dict (export trained TPU
# weights for the reference's drivers / tooling)
# ---------------------------------------------------------------------------


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _export_conv(params, out, fpath, tname, bias=True):
    out[tname + ".weight"] = np.transpose(_get(params, fpath + ("kernel",)),
                                          (3, 2, 0, 1))
    if bias:
        out[tname + ".bias"] = _get(params, fpath + ("bias",))


def _export_linear(params, out, fpath, tname):
    out[tname + ".weight"] = _get(params, fpath + ("kernel",)).T
    out[tname + ".bias"] = _get(params, fpath + ("bias",))


def _export_bn(params, stats, out, fpath, tname):
    out[tname + ".weight"] = _get(params, fpath + ("scale",))
    out[tname + ".bias"] = _get(params, fpath + ("bias",))
    out[tname + ".running_mean"] = _get(stats, fpath + ("mean",))
    out[tname + ".running_var"] = _get(stats, fpath + ("var",))
    out[tname + ".num_batches_tracked"] = np.asarray(0, np.int64)


def bdcn_flax_to_torch(variables):
    """BDCN variables -> a reference-layout state_dict ({name: np.ndarray})
    loadable by the reference ``bdcn_new.BDCN`` with ``strict=False``. The
    exact inverse of :func:`bdcn_torch_to_flax`; the fixed bilinear
    ``upsample_*`` deconvs are analytic constants on both sides (the torch
    model re-creates them in ``_initialize_weights``, bdcn_new.py:193-201)
    and are not exported."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    for name in [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
        "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
        "conv5_3",
    ]:
        _export_conv(params, out, ("features", name), f"features.{name}")
    stage_blocks = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}
    for s, nb in stage_blocks.items():
        for j in range(1, nb + 1):
            for cname in ("conv", "conv1", "conv2", "conv3"):
                _export_conv(params, out, (f"msblock{s}_{j}", cname),
                             f"msblock{s}_{j}.{cname}")
            _export_conv(params, out, (f"conv{s}_{j}_down",),
                         f"conv{s}_{j}_down")
        _export_conv(params, out, (f"score_dsn{s}",), f"score_dsn{s}")
        _export_conv(params, out, (f"score_dsn{s}_1",), f"score_dsn{s}_1")
    _export_conv(params, out, ("fuse",), "fuse")
    return out


def esfnet_flax_to_torch(variables, setting):
    """ESFNet variables -> a reference-layout state_dict ({name: np.ndarray})
    loadable by the reference DenseNet2D (wrap values in torch tensors). The
    exact inverse of :func:`esfnet_torch_to_flax` (round-trip tested)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    def conv_block(fprefix, tprefix):
        _export_conv(params, out, fprefix + ("conv1",), tprefix + ".conv1")
        _export_conv(params, out, fprefix + ("conv2",), tprefix + ".conv2")
        _export_bn(params, stats, out, fprefix + ("bn",), tprefix + ".bn")

    def down_block(fprefix, tprefix):
        for name in ("conv1", "conv21", "conv22", "conv31", "conv32"):
            _export_conv(params, out, fprefix + (name,), f"{tprefix}.{name}")
        _export_conv(params, out, fprefix + ("td_conv",), tprefix + ".TD.conv")

    def up_block(fprefix, tprefix):
        for name in ("conv11", "conv12", "conv21", "conv22"):
            _export_conv(params, out, fprefix + (name,), f"{tprefix}.{name}")

    conv_block(("enc", "head"), "enc.head")
    for i in range(1, 5):
        down_block(("enc", f"down_block{i}"), f"enc.down_block{i}")
    down_block(("enc", "bottleneck"), "enc.bottleneck")
    for i in (4, 3, 2, 1):
        up_block(("dec", f"up_block{i}"), f"dec.up_block{i}")
    conv_block(("dec", "final"), "dec.final")

    _export_conv(params, out, ("elReg", "c1"), "elReg.c1")
    _export_conv(params, out, ("elReg", "c2"), "elReg.c2")
    _export_conv(params, out, ("elReg", "c3"), "elReg.c3", bias=False)
    _export_linear(params, out, ("elReg", "l1"), "elReg.l1")
    _export_linear(params, out, ("elReg", "l2"), "elReg.l2")

    if getattr(setting, "add_seg", 0):
        for i in range(5):
            _export_conv(params, out, ("seg_encoder", f"conv{i}"),
                         f"seg_encoder.model.{i}.conv")
        _export_conv(params, out, ("seg_encoder", "conv_out"),
                     "seg_encoder.model.6")
        for i in range(3):
            _export_linear(params, out, ("mlp", f"fc{i}"), f"mlp.model.{i}.fc")
    return out
