#!/usr/bin/env python3
"""Widened real-clip protocol: score committed artifacts on the WHOLE demo
clip, distributionally, out-of-sample (VERDICT r2 #6).

The in-training real pass (cli/distill.py --real_video) scores 64 frames
and reports a mean; this driver re-scores a trained artifact post hoc on
every frame of the clip (the reference's shipped ``videos/example1.avi`` —
its serving config hardcodes that clip, evaluate.py:357-358, video path
evaluate.py:195-305), EXCLUDING the frame range the artifact's --real_mix
run trained on (reconstructed from the artifact's args.json, so the score
stays out-of-sample), and reports the per-frame distribution (p10/p50/p90)
next to the mean — a mean alone hides bimodal failures like blinks.

With ``--ckpt_b`` it additionally scores a second artifact on the SAME
frames plus the two students against each other — e.g. the BDCN-fed vs
oracle-GT-edge ablation arms, both serving with the SAME trained BDCN
edge stage (real frames have no GT edges; the comparison measures whether
oracle-edge training transfers to BDCN-edge serving).

Reads each artifact dir (args.json + checkpoints/), writes
``real_protocol.json`` beside artifact A's gate.json, prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help="artifact dir (args.json + checkpoints/) of the "
                        "student/model to score — e.g. artifacts/ns_chz6_rm2")
    p.add_argument("--ckpt_b", type=str, default="",
                   help="optional second artifact: scored on the same "
                        "frames, plus an A<->B agreement block")
    p.add_argument("--teacher_ckpt", type=str,
                   default="artifacts/teacher/checkpoints",
                   help="teacher checkpoint dir (agreement truth side)")
    p.add_argument("--teacher_setting", type=str, default="baseline_edge")
    p.add_argument("--bdcn_weights", type=str, default="",
                   help="override the BDCN path recorded in args.json "
                        "(auto-falls back to artifacts/bdcn/checkpoints "
                        "when the recorded path is gone)")
    p.add_argument("--video", type=str,
                   default="/root/reference/videos/example1.avi")
    p.add_argument("--frames", type=int, default=0,
                   help="<=0 = the whole clip")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--out", type=str, default="",
                   help="default: <ckpt dir>/real_protocol.json")
    p.add_argument("--refine_ab", type=int, default=0,
                   help="also run the refinement on/off A/B at this "
                        "artifact (VERDICT r3 #5): student iris/pupil "
                        "ellipses raw vs 40-sweep-refined, scored against "
                        "the teacher's seg mask (raster IoU) and refined "
                        "ellipse (rotated-bbox IoU); adds a refine_ab "
                        "block with a keep/drop verdict")
    p.add_argument("--dump_scores", type=int, default=0,
                   help="save the per-eye score arrays (agree, center "
                        "deltas, pupil-pixel visibility signals) to "
                        "<artifact>/real_scores.npz for offline tail "
                        "analysis")
    return p.parse_args(argv)


def _artifact_args(art_dir):
    """The args dict recorded by the run that produced ``art_dir``
    (utils.logging.dump_run_args writes args.json beside checkpoints/)."""
    path = os.path.join(art_dir, "args.json")
    if not os.path.isfile(path):  # a bare checkpoints/ dir was passed
        path = os.path.join(os.path.dirname(art_dir.rstrip("/")), "args.json")
    with open(path) as f:
        return json.load(f)["args"]


def _ckpt_dir(art_dir):
    sub = os.path.join(art_dir, "checkpoints")
    return sub if os.path.isdir(sub) else art_dir


def _resolve_bdcn(recorded, override):
    """The artifact records the bdcn path of its RUN (e.g. logs/...), which
    a fresh clone no longer has — fall back to the committed artifacts/
    copy. An artifact that trained WITHOUT a bdcn stays edge-free."""
    if override:
        return override
    if not recorded:
        return ""
    if recorded == "random" or os.path.exists(recorded):
        return recorded
    fallback = "artifacts/bdcn/checkpoints"
    return fallback if os.path.isdir(fallback) else recorded


def _dist_block(sc):
    """Distribution block from a real_frame_eye_scores dict: agreement +
    pupil AND iris center deltas (reference test.py:235-238 reports both),
    plus a visibility-split tail account (VERDICT r4 missing #4): eyes
    where the truth side's argmax has < REAL_VISIBILITY_MIN_PUPIL_PX pupil
    pixels (blink/occlusion — the center is ill-defined) are counted and
    the center stats are re-reported over visible eyes only, the
    reference's cond-mask discipline (CurriculumLib.py:189-193) applied to
    serving."""
    import numpy as np

    from eghmd_tpu.training.distill import REAL_VISIBILITY_MIN_PUPIL_PX

    agree, delta, iris = sc["agree"], sc["pup_delta"], sc["iris_delta"]
    q = lambda v, p: round(float(np.nanpercentile(v, p)), 4)
    visible = np.asarray(sc["pup_px_b"]) >= REAL_VISIBILITY_MIN_PUPIL_PX
    out = {
        "agreement_miou": round(float(np.nanmean(agree)), 4),
        "agreement_p10": q(agree, 10),
        "agreement_p50": q(agree, 50),
        "agreement_p90": q(agree, 90),
        "pup_c_delta_px": round(float(np.nanmean(delta)), 4),
        "pup_c_delta_p50": q(delta, 50),
        "pup_c_delta_p90": q(delta, 90),
        "iris_c_delta_px": round(float(np.nanmean(iris)), 4),
        "iris_c_delta_p50": q(iris, 50),
        "iris_c_delta_p90": q(iris, 90),
        "visible_frac": round(float(np.mean(visible)), 4),
    }
    if visible.any() and not visible.all():
        dv, iv = delta[visible], iris[visible]
        out["visible_only"] = {
            "pup_c_delta_px": round(float(np.nanmean(dv)), 4),
            "pup_c_delta_p50": q(dv, 50),
            "pup_c_delta_p90": q(dv, 90),
            "iris_c_delta_p50": q(iv, 50),
            "iris_c_delta_p90": q(iv, 90),
        }
        # classify the worst-decile pupil-delta eyes: how much of the tail
        # is blink/occlusion (not-visible) vs genuine failure on a visible
        # pupil?
        thr = np.nanpercentile(delta, 90)
        tail = delta >= thr
        out["tail_p90"] = {
            "threshold_px": round(float(thr), 2),
            "n_tail_eyes": int(np.sum(tail)),
            "n_tail_not_visible": int(np.sum(tail & ~visible)),
            "frac_tail_blink_or_occlusion": round(
                float(np.sum(tail & ~visible) / max(1, np.sum(tail))), 4),
        }
    return out


def main(argv=None):
    args = parse_args(argv)

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from cli.args import build_edge_fn
    from eghmd_tpu.config import resolve_variant, scaled_variant
    from eghmd_tpu.data.realframes import decode_gray_frames
    from eghmd_tpu.models import build_model
    from eghmd_tpu.training import real_frame_eye_scores
    from eghmd_tpu.training.checkpoints import load_checkpoint_variables

    def load_artifact(art_dir):
        """(model, variables, run-args) from an artifact dir."""
        import jax.numpy as jnp

        a = _artifact_args(art_dir)
        chz, growth = a.get("chz", 32), a.get("growth", 1.2)
        variant = resolve_variant(a["setting"])
        if chz != 32 or growth != 1.2:
            variant = scaled_variant(variant, chz, growth)
        model = build_model("ritnet_v2", variant, jnp.float32,
                            chz=chz, growth=growth,
                            seg_downscale=a.get("seg_downscale", 1),
                            input_downscale=a.get("input_downscale", 1))
        return model, load_checkpoint_variables(_ckpt_dir(art_dir)), a

    model_a, vars_a, args_a = load_artifact(args.ckpt)
    a_variant = resolve_variant(args_a["setting"])
    edge_thres = bool(a_variant.edge_thres or args_a.get("edge_thres", 0))
    h, w = args_a.get("image_height", 240), args_a.get("image_width", 320)

    bdcn = _resolve_bdcn(args_a.get("bdcn_weights", ""), args.bdcn_weights)

    def edge_at(factor):
        if not bdcn:
            return None

        class _A:
            bdcn_weights = bdcn
            edge_downscale = factor
            image_height = h
            image_width = w

        import jax.numpy as jnp

        return build_edge_fn(_A, jnp.float32)

    # each model serves with ITS trained edge fidelity; the teacher (the
    # truth side) always gets the full-fidelity edge (cli/distill.py
    # gate conditions)
    a_ds = args_a.get("edge_downscale", 1)
    edge_a = edge_at(a_ds)
    edge_full = edge_at(1) if a_ds > 1 else None  # None = same as edge_a

    teacher_setting = args_a.get("teacher_setting", args.teacher_setting)
    t_chz = args_a.get("teacher_chz", 32)
    t_growth = args_a.get("teacher_growth", 1.2)
    t_variant = resolve_variant(teacher_setting)
    if t_chz != 32 or t_growth != 1.2:
        t_variant = scaled_variant(t_variant, t_chz, t_growth)
    import jax.numpy as jnp

    teacher = build_model("ritnet_v2", t_variant, jnp.float32,
                          chz=t_chz, growth=t_growth)
    teacher_vars = load_checkpoint_variables(args.teacher_ckpt)

    frames = decode_gray_frames(args.video, args.frames)
    if frames.size == 0:
        raise SystemExit(f"no frames decoded from {args.video}")
    clip_frames = int(frames.shape[0])

    # out-of-sample exclusion: a --real_mix run trained on the crops of
    # ceil(real_mix / eyes-per-frame) frames starting at --real_frames
    # (cli/distill.py: decode_eye_crops(skip_frames=real_frames))
    per = 2 if frames.shape[2] >= 2 * w else 1

    def train_range(a):
        mix = a.get("real_mix", 0)
        if not mix:
            return None
        lo = a.get("real_frames", 64)
        return (lo, lo + -(-mix // per))

    ranges = [train_range(args_a)]
    model_b = vars_b = args_b = None
    if args.ckpt_b:
        model_b, vars_b, args_b = load_artifact(args.ckpt_b)
        ranges.append(train_range(args_b))
    ranges = [r for r in ranges if r is not None]
    excluded = (min(r[0] for r in ranges),
                max(r[1] for r in ranges)) if ranges else None
    if excluded is not None:
        lo, hi = excluded
        frames = np.concatenate([frames[:lo], frames[hi:]], axis=0)

    score = lambda m_x, v_x, m_y, v_y, e_x, e_y: real_frame_eye_scores(
        m_x, v_x, m_y, v_y, frames, edge_fn_a=e_x, edge_fn_b=e_y,
        edge_thres=edge_thres, batch=args.batch, eye_size=(h, w))

    sc_a = score(model_a, vars_a, teacher, teacher_vars, edge_a, edge_full)
    if args.dump_scores:
        # per-eye arrays beside the JSON so the tail can be analyzed
        # offline (which eyes are the worst decile, and WHY — blink proxy,
        # agreement, temporal clustering) without re-running the models
        art = (args.ckpt if os.path.isdir(
                   os.path.join(args.ckpt, "checkpoints"))
               else os.path.dirname(args.ckpt.rstrip("/")))
        np.savez(os.path.join(art, "real_scores.npz"),
                 **{k: np.asarray(v) for k, v in sc_a.items()})
    record = {
        "artifact": args.ckpt.rstrip("/"),
        "video": args.video,
        "clip_frames": clip_frames,
        "excluded_train_frames": list(excluded) if excluded else None,
        "eval_frames": int(frames.shape[0]),
        "eval_eyes": int(sc_a["agree"].shape[0]),
        "vs_teacher": _dist_block(sc_a),
    }
    if args.refine_ab:
        from eghmd_tpu.training.distill import real_frame_refine_ab

        ab = real_frame_refine_ab(model_a, vars_a, teacher, teacher_vars,
                                  frames, edge_fn_s=edge_a,
                                  edge_fn_t=edge_full,
                                  edge_thres=edge_thres, batch=args.batch,
                                  eye_size=(h, w))
        block = {}
        for name in ("iris", "pupil"):
            for metric in ("segiou", "bbiou", "bbiou_rawT"):
                raw = ab[f"{name}_{metric}_raw"]
                ref = ab[f"{name}_{metric}_ref"]
                d = ref - raw
                block[f"{name}_{metric}"] = {
                    "raw_mean": round(float(np.nanmean(raw)), 4),
                    "ref_mean": round(float(np.nanmean(ref)), 4),
                    "delta_mean": round(float(np.nanmean(d)), 4),
                    "delta_p10": round(float(np.nanpercentile(d, 10)), 4),
                    "delta_p50": round(float(np.nanpercentile(d, 50)), 4),
                    "delta_p90": round(float(np.nanpercentile(d, 90)), 4),
                    "frac_improved": round(float(np.mean(d > 0)), 4),
                }
        # keep refinement iff it moves the PUPIL ellipse toward the
        # teacher's boundary on average (the tracker's primary output);
        # centers are untouched either way. The verdict carries its
        # caveats explicitly (VERDICT r4 weak #3): bbiou vs the teacher's
        # REFINED ellipse shares the refinement procedure on both sides
        # (the bbiou_rawT variant removes that advantage), and the pupil
        # bbox tail can worsen even when the mask-IoU verdict is "keep".
        block["recommendation"] = (
            "keep" if block["pupil_segiou"]["delta_mean"] > 0 else "drop")
        block["caveats"] = {
            "bbiou_same_procedure_bias":
                "bbiou targets the teacher's refined ellipse; compare "
                "bbiou_rawT (teacher raw target) for the unbiased delta",
            "pupil_bbox_tail_frac_worsened": round(
                1.0 - block["pupil_bbiou"]["frac_improved"], 4),
        }
        record["refine_ab"] = block
    if model_b is not None:
        b_ds = args_b.get("edge_downscale", 1)
        edge_b = edge_at(b_ds)
        b_full = edge_at(1) if b_ds > 1 else None
        sc_b = score(model_b, vars_b, teacher, teacher_vars, edge_b, b_full)
        sc_ab = score(model_a, vars_a, model_b, vars_b, edge_a,
                      edge_b if b_ds != a_ds else None)
        record["artifact_b"] = args.ckpt_b.rstrip("/")
        record["b_vs_teacher"] = _dist_block(sc_b)
        record["a_vs_b"] = _dist_block(sc_ab)

    out = args.out or os.path.join(
        args.ckpt if os.path.isdir(os.path.join(args.ckpt, "checkpoints"))
        else os.path.dirname(args.ckpt.rstrip("/")), "real_protocol.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
