#!/usr/bin/env python3
"""Host input-pipeline benchmark (no device needed).

The training-side host hot loop is the per-sample preprocessing chain
(reference CurriculumLib.py:94-166): pad -> augment -> label remap ->
Canny boundary weights -> 3x signed EDT -> standardize -> ellipse
normalization. SURVEY §7 flags the EDT/Canny work as the host bottleneck
for high-throughput training; this driver measures it:

  - per-op: signed_distance_maps (native C++ vs scipy fallback) and
    boundary_weights at the training shape;
  - per-sample: the full ``assemble_sample`` chain, native vs fallback;
  - end-to-end: ``DataPipeline`` host-side batch assembly throughput
    (threaded collate, no device_put so the run never touches a backend —
    this box's TPU tunnel can be down).

Prints one JSON line. Raw eye rendering is excluded from all timings —
real deployments read pre-extracted H5 archives, they don't render.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_per_call(fn, n, *args_list):
    t0 = time.perf_counter()
    for a in args_list[:n]:
        fn(*a)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32, help="samples per measurement")
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args(argv)

    from eghmd_tpu.data.hostops import boundary_weights, signed_distance_maps
    from eghmd_tpu.data.pipeline import DataPipeline
    from eghmd_tpu.data.sample import assemble_sample
    from eghmd_tpu.data.synthetic import SyntheticEyeDataset, render_eye
    from eghmd_tpu.runtime import hostops_native

    h, w = args.image_height, args.image_width
    n = args.n

    # pre-render raw inputs (reading H5 archives stands in for this in
    # production; rendering is not part of the measured chain)
    raws = []
    for i in range(n):
        rng = np.random.RandomState(1000 + i)
        img, mask, iris_p, pupil_p, pupil_c = render_eye(rng, h, w)
        raws.append((img, mask, iris_p, pupil_p, pupil_c,
                     np.zeros(4, bool), rng))
    label0 = raws[0][1].copy()
    label0[label0 == 1] = 0
    label0[label0 == 2] = 1
    label0[label0 == 3] = 2
    labels = [label0.astype(np.int64)] * n

    native_ok = hostops_native.available()
    results = {"native_available": bool(native_ok),
               "shape": f"{h}x{w}", "n": n}

    def run_assemble(i):
        img, mask, iris_p, pupil_p, pupil_c, cond, _ = raws[i]
        rng = np.random.RandomState(2000 + i)  # deterministic augment draws
        return assemble_sample(img, mask, iris_p, pupil_p, pupil_c, cond,
                               size=(h, w), aug=True, rng=rng)

    def measure_suite(tag):
        results[f"edt_ms_{tag}"] = round(_time_per_call(
            lambda l: signed_distance_maps(l, 3), n,
            *[(l,) for l in labels]) * 1e3, 2)
        t0 = time.perf_counter()
        for i in range(n):
            run_assemble(i)
        per = (time.perf_counter() - t0) / n
        results[f"sample_ms_{tag}"] = round(per * 1e3, 2)
        results[f"samples_per_sec_{tag}"] = round(1.0 / per, 1)

    if native_ok:
        measure_suite("native")
        # force the pure-python scipy fallback for the comparison
        orig = hostops_native.available
        hostops_native.available = lambda: False
        try:
            measure_suite("python")
        finally:
            hostops_native.available = orig
    else:  # pragma: no cover - g++ is baked into the target image
        measure_suite("python")

    results["boundary_weights_ms"] = round(_time_per_call(
        boundary_weights, n, *[(l,) for l in labels]) * 1e3, 2)

    # end-to-end host pipeline: threaded per-sample assembly + collate over
    # pre-rendered raw inputs (the H5-read stand-in), fresh augment draws
    # per epoch like a real training run
    class RawAssembleDataset:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return run_assemble(int(i))

    pipe = DataPipeline(RawAssembleDataset(), args.batchsize, sharding=None,
                        shuffle=True, num_workers=args.workers,
                        drop_last=True)
    for _ in pipe._batches_host():  # warm epoch (thread pool spin-up)
        pass
    t0 = time.perf_counter()
    nb = 0
    for _ in pipe._batches_host():
        nb += 1
    dt = time.perf_counter() - t0
    results["pipeline_samples_per_sec"] = round(nb * args.batchsize / dt, 1)
    results["pipeline_batches"] = nb

    key = "native" if native_ok else "python"
    print(json.dumps({
        "metric": "host_pipeline_samples_per_sec",
        "value": results[f"samples_per_sec_{key}"],
        "unit": "samples/sec/core",
        **results,
    }))
    return results


if __name__ == "__main__":
    main()
