"""Typed configuration for eghmd_tpu.

The reference uses a two-tier config: 23 argparse run flags (reference
args.py:30-65) plus YAML model-variant settings (reference configs/*.yaml,
loaded at train.py:38-40,54). We unify both into frozen dataclasses; the YAML
variant names are kept as presets so reference configs remain loadable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class VariantConfig:
    """Model-variant flags (reference configs/*.yaml keys).

    Exactly one fusion mode should be active; ``input_concat + add_edge < 2``
    is asserted like the reference (models/RITnet_v2.py:273).
    """

    add_seg: int = 0          # AdaIN re-modulation of bottleneck from seg map
    seg_detach: int = 0       # stop-gradient through the seg map fed to AdaIN
    add_edge: int = 0         # ESF-Net: shared encoder run on edge map, concat bottlenecks
    edge_thres: int = 0       # hard-threshold BDCN edges at 0.1 (utils.py:653-655)
    add_selayer: int = 0      # unused by reference drivers; kept for config parity
    generate_eyeball: int = 0 # unused by reference drivers; kept for config parity
    feature_channels: int = 153
    style_dim: int = 8
    input_concat: int = 0     # 2-channel input [img, edge]
    only_edge: int = 0        # edge map replaces the image

    def __post_init__(self):
        assert self.input_concat + self.add_edge < 2, "edge can be used only once"

    @property
    def bottleneck_channels(self) -> int:
        return self.feature_channels * (2 if self.add_edge else 1)


# Presets mirroring reference configs/*.yaml byte-for-byte semantics.
VARIANT_PRESETS = {
    "baseline": VariantConfig(),
    "baseline_edge": VariantConfig(add_edge=1),
    "baseline_edge_thres": VariantConfig(add_edge=1, edge_thres=1),
    "baseline_adain": VariantConfig(add_seg=1, edge_thres=1),
    "baseline_adain_edge": VariantConfig(add_seg=1, add_edge=1, edge_thres=1),
    "baseline_input_concat": VariantConfig(input_concat=1),
    "baseline_only_edge": VariantConfig(only_edge=1),
}


def scaled_variant(base: VariantConfig, chz: int, growth: float = 1.2) -> VariantConfig:
    """Variant config for a width-scaled (pruned/distilled student) ESF-Net.

    The reference hard-codes ``feature_channels: 153`` because its encoder is
    fixed at chz=32, growth=1.2 (reference models/RITnet_v2.py:15-29, where
    the bottleneck width is int(growth*chz*4)). A student model with a
    different width needs the bottleneck-derived fields rescaled so the AdaIN
    MLP and the dsIdentify head are sized to the student's latent.
    """
    return dataclasses.replace(base, feature_channels=int(growth * chz * 4))


def variant_from_yaml(path: str) -> VariantConfig:
    """Load a reference-format YAML variant config."""
    import yaml

    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    known = {f.name for f in dataclasses.fields(VariantConfig)}
    return VariantConfig(**{k: v for k, v in raw.items() if k in known})


def resolve_variant(name_or_path: str) -> VariantConfig:
    if name_or_path in VARIANT_PRESETS:
        return VARIANT_PRESETS[name_or_path]
    import os

    stem = os.path.splitext(os.path.basename(name_or_path))[0]
    if os.path.exists(name_or_path):
        return variant_from_yaml(name_or_path)
    if stem in VARIANT_PRESETS:
        return VARIANT_PRESETS[stem]
    raise ValueError(f"unknown variant {name_or_path!r}")


@dataclass(frozen=True)
class ExperimentConfig:
    """Run-level flags (parity with reference args.py:30-65)."""

    lr: float = 5e-4
    prec: str = "float32"           # compute dtype: float32 | bfloat16
    model: str = "ritnet_v2"        # ritnet_v2 (ESF-Net) | ritnet_v1 | deepvog | ritnet_concat
    cur_obj: str = "LPW"            # curriculum / dataset selection
    epochs: int = 40
    resume: bool = False
    workers: int = 4
    overfit: int = 0                # >0: truncate to N batches (smoke check)
    expname: str = "dev"
    self_corr: bool = False
    loadfile: str = ""
    path2data: str = ""
    batchsize: int = 12
    test_mode: str = "leaveoneout"
    disentangle: bool = True
    setting: str = "baseline"       # variant preset name or YAML path
    edge_thres: int = 0             # run-level override (reference utils.py:653)
    edge_downscale: int = 1         # fast-edge: run BDCN at 1/N res, upsample fuse map
    test_normal: bool = False       # truncated-run sanity flag (train.py:263)
    seed: int = 0
    image_size: Tuple[int, int] = (240, 320)  # (H, W) per eye
    log_dir: str = "logs"
    profile_dir: str = ""           # non-empty: jax.profiler trace of early steps
    weights_init: str = "flax"      # flax | reference (He/0.01) | xavier
    remat: bool = False             # rematerialize enc/dec in backward (fits
                                    # 240x320 batch>=16 f32 training in HBM)
    # TPU-specific
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> all devices on 'data'
    donate_state: bool = True

    @property
    def variant(self) -> VariantConfig:
        return resolve_variant(self.setting)

    @property
    def dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "16": jnp.bfloat16,
                "32": jnp.float32}[str(self.prec)]
