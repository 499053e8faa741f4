"""Native C++ host ops: parity against scipy and throughput sanity."""

import time

import numpy as np
import pytest

from eghmd_tpu.runtime import hostops_native
from eghmd_tpu.data.hostops import one_hot_to_dist

pytestmark = pytest.mark.skipif(
    not hostops_native.available(), reason="native hostops unavailable (no g++)"
)


def test_edt_matches_scipy():
    from scipy.ndimage import distance_transform_edt

    rng = np.random.RandomState(0)
    seeds = (rng.rand(120, 160) < 0.01).astype(np.uint8)
    seeds[60, 80] = 1
    ours = hostops_native.edt_to_nonzero(seeds)
    # scipy: distance to nearest zero of input -> invert seeds
    ref = distance_transform_edt(1 - seeds)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_signed_distance_maps_match_python():
    rng = np.random.RandomState(1)
    label = np.zeros((120, 160), np.int32)
    label[30:80, 40:120] = 1
    label[45:65, 60:100] = 2
    native = hostops_native.signed_distance_maps(label, 3)
    for c in range(3):
        ref = one_hot_to_dist(label == c)
        np.testing.assert_allclose(native[..., c], ref, rtol=1e-4, atol=1e-5)


def test_absent_class_zeroed():
    label = np.zeros((32, 32), np.int32)
    native = hostops_native.signed_distance_maps(label, 3)
    assert np.all(native[..., 1] == 0) and np.all(native[..., 2] == 0)
    assert np.any(native[..., 0] != 0)


def test_boundary_weights_values():
    label = np.zeros((64, 64), np.int32)
    label[20:40, 20:40] = 2
    w = hostops_native.boundary_weights(label)
    assert w.min() == 1.0 and w.max() == 21.0


def test_speedup_vs_scipy():
    rng = np.random.RandomState(2)
    label = rng.randint(0, 3, (240, 320)).astype(np.int32)
    # warm
    hostops_native.signed_distance_maps(label, 3)

    # best-of-N: this box has ONE core, so a concurrently running job
    # (e.g. a TPU driver's host thread) can preempt any single trial;
    # the min over trials is robust to that, the mean is not.
    def best_of(fn, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    native_t = best_of(lambda: hostops_native.signed_distance_maps(label, 3))
    scipy_t = best_of(
        lambda: [one_hot_to_dist(label == c) for c in range(3)])
    # The native path must be meaningfully faster. On a quiet box it is
    # ~5-10x (the number of record is cli/bench_host.py in BASELINE.md);
    # this assertion only pins that the C++ path is wired in and wins.
    # The margin is 1.3x, not 2x, because the native path is THREADED and
    # a concurrent TPU-driver host thread on this 1-core box degrades it
    # more than it degrades single-threaded scipy (measured 1.94x under
    # contention even with best-of-N).
    assert native_t < scipy_t / 1.3, (native_t, scipy_t)
