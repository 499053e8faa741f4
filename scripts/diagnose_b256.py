#!/usr/bin/env python3
"""Diagnose the b256 serving-throughput cliff (VERDICT r3 #6).

Round-3 sweep: 2043 fps at b64 -> 111.7 fps at b256 (20x collapse). The
hypothesis is HBM oversubscription: at batch 256 the dual-eye step holds
512 eye rows, whose full-resolution early-stage activations alone are
512 x 240 x 320 x chz x 4B ~ 5 GB per tensor — XLA then either
serializes convolutions into bandwidth-wasting slices or pushes peak
bytes against the 16 GB chip.

This runs the flagship serving step at a ladder of batches, recording
fenced fps AND the device allocator's peak/live bytes per compiled
program (jax.Device.memory_stats), printing one JSON line for
BASELINE.md. Usage: python scripts/diagnose_b256.py [--batches 64,192,256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="64,256")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--edge_downscale", type=int, default=4)
    p.add_argument("--seg_downscale", type=int, default=4)
    p.add_argument("--input_downscale", type=int, default=1)
    args = p.parse_args(argv)

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bench import _fence, build_pipeline

    dev = jax.devices()[0]

    def stats():
        s = dev.memory_stats() or {}
        return {k: s.get(k) for k in
                ("bytes_in_use", "peak_bytes_in_use", "largest_alloc_size",
                 "bytes_limit") if s.get(k) is not None}

    out = {"device": str(dev), "rows": []}
    for bs in [int(b) for b in args.batches.split(",")]:
        row = {"batch_frames": bs}
        try:
            jitted, variables, bdcn_vars, frames = build_pipeline(
                dtype=jnp.bfloat16, batch_frames=bs,
                edge_downscale=args.edge_downscale,
                seg_downscale=args.seg_downscale,
                input_downscale=args.input_downscale)
            _fence(jitted(variables, bdcn_vars, frames))  # compile + warm
            row["after_warm"] = stats()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = jitted(variables, bdcn_vars, frames)
            _fence(r)
            dt = time.perf_counter() - t0
            row["fps"] = round(bs * args.iters / dt, 1)
            row["stats"] = stats()
            lim = row["stats"].get("bytes_limit")
            peak = row["stats"].get("peak_bytes_in_use")
            if lim and peak:
                row["peak_frac_of_limit"] = round(peak / lim, 3)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
        out["rows"].append(row)
        print(f"b{bs}: {row.get('fps', 'ERR')} fps, peak "
              f"{row.get('stats', {}).get('peak_bytes_in_use', '?')}",
              file=sys.stderr)
    print(json.dumps(out))
    return out


def mem_analysis(argv=None):
    """Compile-time peak-memory ladder (no execution, no allocator).

    The first diagnostic run showed the axon runtime exposes NO
    ``Device.memory_stats`` and that the b256 program dies in the
    server-side compile helper before any measurement exists. XLA's
    ``compiled.memory_analysis()`` sidesteps both: it reports the
    compiler's own scheduled peak (temp + arguments + output) for batches
    that DO compile, and a linear batch extrapolation bounds the b256
    peak against the 16 GB chip. Usage:
    ``python scripts/diagnose_b256.py --mem 64,128``.
    """
    p = argparse.ArgumentParser()
    p.add_argument("--mem", type=str, default="64,128")
    p.add_argument("--extrapolate", type=int, default=256)
    p.add_argument("--edge_downscale", type=int, default=4)
    p.add_argument("--seg_downscale", type=int, default=4)
    p.add_argument("--input_downscale", type=int, default=1)
    args = p.parse_args(argv)

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from bench import build_pipeline

    out = {"rows": [], "hbm_limit_gb": 16.0}
    rows = []
    for bs in [int(b) for b in args.mem.split(",")]:
        row = {"batch_frames": bs}
        try:
            jitted, variables, bdcn_vars, frames = build_pipeline(
                dtype=jnp.bfloat16, batch_frames=bs,
                edge_downscale=args.edge_downscale,
                seg_downscale=args.seg_downscale,
                input_downscale=args.input_downscale)
            compiled = jitted.lower(variables, bdcn_vars, frames).compile()
            ma = compiled.memory_analysis()
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    row[k] = int(v)
            temp = row.get("temp_size_in_bytes", 0)
            arg = row.get("argument_size_in_bytes", 0)
            outb = row.get("output_size_in_bytes", 0)
            row["peak_gb"] = round((temp + arg + outb) / 2**30, 3)
            rows.append((bs, temp, arg, outb))
        except Exception as e:
            row["error"] = (f"{type(e).__name__}: "
                            f"{str(e).splitlines()[0][:300]}")
        out["rows"].append(row)
        print(f"b{bs}: peak {row.get('peak_gb', '?')} GB "
              f"(temp {row.get('temp_size_in_bytes', '?')})",
              file=sys.stderr)
    if len(rows) >= 2:
        # temp bytes are activation-dominated -> linear in batch; solve the
        # affine fit from the two largest COMPILED batches. Argument and
        # output bytes are taken from the last successful row (not
        # out["rows"][-1], which can be an error row with arg=0 when the
        # largest batch fails to compile) and scaled linearly in batch, and
        # output bytes are included so the extrapolated peak is consistent
        # with the per-row peak_gb (ADVICE r4 #1).
        (b1, t1, _, _), (b2, t2, arg2, out2) = rows[-2], rows[-1]
        slope = (t2 - t1) / max(b2 - b1, 1)
        t256 = t2 + slope * (args.extrapolate - b2)
        # arguments = batch-independent weights + the batch-linear frames
        # input (f32 [bs, 400, 640]); outputs are per-frame, fully linear
        frame_bytes = 400 * 640 * 4
        weights = max(arg2 - b2 * frame_bytes, 0)
        arg_x = weights + args.extrapolate * frame_bytes
        out_x = out2 * args.extrapolate / max(b2, 1)
        peak = t256 + arg_x + out_x
        out["extrapolated"] = {
            "batch_frames": args.extrapolate,
            "temp_gb": round(t256 / 2**30, 2),
            "peak_gb": round(peak / 2**30, 2),
            "exceeds_hbm": bool(peak / 2**30 > 16.0),
        }
        print(f"extrapolated b{args.extrapolate}: "
              f"{out['extrapolated']['peak_gb']} GB peak", file=sys.stderr)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if "--mem" in sys.argv:
        mem_analysis()
    else:
        main()
