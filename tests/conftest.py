import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: substitute for the
# fake-cluster testing the reference lacks).
#
# NOTE: this image's baked sitecustomize registers the 'axon' TPU backend at
# interpreter startup and pins jax_platforms to it, overriding the
# JAX_PLATFORMS env var — so we must override via jax.config AFTER import.
# XLA_FLAGS must still be set before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU-mesh compiles of the big train/serving programs; caching them across
# runs cuts repeat-suite time sharply.
from eghmd_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def pytest_configure(config):
    assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
        f"tests require the virtual 8-device CPU mesh, got {jax.devices()}"
    )
