from .esfnet import ESFNet, ESFNetWithDS, DenseEncoder, DenseDecoder, get_sizes
from .ritnet_v1 import RITnetV1
from .deepvog import DeepVOG, deepvog_loss
from .ritnet_concat import RITnetConcat
from .ritnet_noreg import RITnetNoReg
from .bdcn import BDCN, VGG16C, MSBlock, make_edge_fn


def build_model(name, variant=None, dtype=None, seg_downscale=1, chz=32,
                growth=1.2, remat=False, input_downscale=1):
    """Model registry (reference train.py:135-141 / modelSummary.py).

    ``seg_downscale`` selects the fast-seg serving mode on ESF-Net
    (checkpoint-compatible; see models/esfnet.py); ``input_downscale`` the
    fast-input mode (NOT checkpoint-compatible — train through it). ``chz``/
    ``growth`` scale the ESF-Net width (the reference fixes 32/1.2 at
    models/RITnet_v2.py:204-210); non-default widths are used for distilled
    serving students (training/distill.py) and must pair with a
    ``scaled_variant`` config."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if name in ("ritnet_v2", "esfnet"):
        assert variant is not None, "ESF-Net needs a VariantConfig"
        return ESFNet(setting=variant, dtype=dtype, seg_downscale=seg_downscale,
                      chz=chz, growth=growth, remat=remat,
                      input_downscale=input_downscale)
    if name == "ritnet_v1":
        return RITnetV1(dtype=dtype)
    if name == "deepvog":
        return DeepVOG(dtype=dtype)
    if name == "ritnet_concat":
        return RITnetConcat(dtype=dtype)
    if name == "ritnet_noreg":
        assert variant is not None, "ritnet_noreg needs a VariantConfig"
        return RITnetNoReg(setting=variant, dtype=dtype)
    raise ValueError(f"illegal model {name!r}")


__all__ = [
    "ESFNet", "ESFNetWithDS", "DenseEncoder", "DenseDecoder", "get_sizes",
    "RITnetV1", "DeepVOG", "deepvog_loss", "RITnetConcat", "RITnetNoReg",
    "BDCN", "VGG16C", "MSBlock", "make_edge_fn", "build_model",
]
