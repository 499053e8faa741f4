"""Native (C++) runtime host ops with build-on-demand ctypes bindings.

The reference has no hand-written native code (SURVEY §2: 100% Python, native
work lives inside cuDNN/OpenCV/scipy); our native surface replaces the
scipy EDT in the input pipeline's per-sample hot loop with an O(N) exact
euclidean distance transform (runtime/cpp/hostops.cpp), ~an order of
magnitude faster per sample and free of scipy dispatch overhead.

Usage: ``from eghmd_tpu.runtime import hostops_native`` — falls back cleanly
when no compiler is available (``available()`` returns False).
"""

from . import hostops_native  # noqa: F401
