"""Persistent XLA compilation cache.

Every CLI entry point calls :func:`enable_persistent_cache` so repeat
invocations (bench sweeps, evaluate runs, distill restarts) skip the
~2-10 min TPU compile of the big serving/train programs. Measured on the
bench: 13.5 min cold (cache-populating) -> 4.2 min warm for the same
invocation; the remaining warm time is executable deserialization and the
cost-analysis lowering.

The JAX_COMPILATION_CACHE_DIR env var, when set, wins (standard JAX
behavior); otherwise the cache lives under ~/.cache/eghmd_tpu/xla.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    """Idempotently point JAX's compilation cache at a writable directory.

    Returns the directory in use.
    """
    import jax

    # This image's sitecustomize registers the experimental TPU platform and
    # PINS jax_platforms at interpreter startup, silently overriding the
    # standard JAX_PLATFORMS env contract. Every entry point routes through
    # here, so restore the contract: an explicit JAX_PLATFORMS=cpu (used by
    # subprocess tests and the virtual multi-chip mesh) must win.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # pragma: no cover - backend already initialized
            pass

    directory = (directory or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "eghmd_tpu", "xla"))
    # The cache is a nice-to-have on every entry point's critical path: an
    # unwritable HOME must degrade to "no cache", never crash the CLI.
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # cache everything that takes meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - unwritable dir / older jax
        pass
    return directory
