#!/usr/bin/env python3
"""Distill a compact serving student from a flagship teacher.

The serving step is HBM-bandwidth-bound (BASELINE.md), so serving faster
requires a smaller model. This driver trains a width-scaled student — by
default the reference's own cheaper ``input_concat`` fusion variant
(one encoder pass, reference models/RITnet_v2.py:279-280) at chz=16 —
to reproduce a ``baseline_edge`` teacher, and prints the acceptance gate
(student-vs-teacher agreement + GT mIoU drop) at the end.

Examples:
    # smoke run on synthetic data with a briefly-trained teacher checkpoint
    python cli/distill.py --synthetic 64 --epochs 5 \
        --teacher_ckpt logs/ritnet_v2/dev/checkpoints --chz 16

    # pure-distillation from a converted reference checkpoint
    python cli/distill.py --teacher_ckpt ref_weights.pkl --w_gt 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.args import build_datasets, build_edge_fn


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # teacher
    p.add_argument("--teacher_ckpt", type=str, default="random",
                   help="orbax checkpoint dir (train CLI output), a torch "
                        "reference .pkl, or 'random' (smoke runs)")
    p.add_argument("--teacher_setting", type=str, default="baseline_edge")
    p.add_argument("--teacher_chz", type=int, default=32)
    p.add_argument("--teacher_growth", type=float, default=1.2)
    # student
    p.add_argument("--setting", type=str, default="baseline_input_concat",
                   help="student fusion variant (default: the reference's "
                        "single-encoder-pass input_concat variant)")
    p.add_argument("--chz", type=int, default=16, help="student width")
    p.add_argument("--growth", type=float, default=1.2)
    p.add_argument("--seg_downscale", type=int, default=1,
                   help="student fast-seg factor, TRAINED THROUGH: the "
                        "student decodes at 1/N and learns to place "
                        "boundaries via the bilinear logits upsample, so "
                        "the gate covers the exact serving shape (post-hoc "
                        "downscales fail the gate at trained checkpoints — "
                        "BASELINE.md)")
    p.add_argument("--input_downscale", type=int, default=1,
                   help="student fast-input factor, TRAINED THROUGH: the "
                        "whole student network runs at 1/N resolution "
                        "(inputs average-pooled at model entry, logits "
                        "bilinearly upsampled back), cutting activation "
                        "HBM traffic ~N^2 in the bandwidth-bound serving "
                        "step. NOT checkpoint-compatible with the full "
                        "model (regression-head flatten width changes)")
    # distillation
    p.add_argument("--temperature", type=float, default=4.0)
    p.add_argument("--w_seg", type=float, default=20.0)
    p.add_argument("--w_el", type=float, default=10.0)
    p.add_argument("--w_gt", type=float, default=1.0,
                   help="ground-truth loss mix-in weight (0 = pure KD)")
    p.add_argument("--w_center", type=float, default=0.0,
                   help="center KD weight: Euclidean distance between the "
                        "student's and teacher's seg-derived soft-argmax "
                        "centers (the seg-KL term is nearly blind to small "
                        "spatial shifts of the pupil blob; this supervises "
                        "the tracker's actual output — reference "
                        "test.py:235-238). 0 disables")
    p.add_argument("--max_miou_drop", type=float, default=0.02)
    p.add_argument("--min_agreement", type=float, default=0.90)
    p.add_argument("--max_center_excess", type=float, default=2.0,
                   help="gate: student val pup-center error may exceed the "
                        "teacher's by at most this many px")
    p.add_argument("--max_real_center_p50", type=float, default=8.0,
                   help="gate: real-clip per-eye median pup-center delta vs "
                        "the teacher must stay under this many px")
    p.add_argument("--init_from_teacher", type=int, default=0,
                   help="bootstrap the student from the teacher's weights "
                        "(requires identical architecture, e.g. shortcut "
                        "calibration: same chz/setting, only the serving "
                        "downscales differ — seg_downscale is checkpoint-"
                        "compatible, models/esfnet.py)")
    p.add_argument("--init_ckpt", type=str, default="",
                   help="partial bootstrap: copy every params/batch_stats "
                        "leaf whose tree path AND shape match from this "
                        "student checkpoint dir; mismatched leaves (e.g. "
                        "the regression-head flatten at input_downscale>1) "
                        "keep their fresh init. Lets a fast-input student "
                        "start from an already-gated full-resolution "
                        "student instead of from scratch")
    # run
    p.add_argument("--resume", type=int, default=0,
                   help="restore the latest student checkpoint for this "
                        "expname and train --epochs MORE epochs")
    p.add_argument("--gate_only", type=int, default=0,
                   help="skip training: restore this expname's BEST "
                        "checkpoint and print its fidelity gate")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize the STUDENT's forward in backward "
                        "(nn.remat, trainer.py semantics): trades FLOPs "
                        "for activation memory AND shrinks the distill-"
                        "step program the axon compile helper must hold "
                        "(the chz4 rung's compile gets SIGKILLed without "
                        "it — BASELINE.md)")
    p.add_argument("--prec", type=int, default=32)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--expname", type=str, default="distill")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--mesh", type=int, default=0)
    # data (same resolution flags as cli/train.py)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--curObj", type=str, default="synthetic")
    p.add_argument("--path2data", type=str, default="")
    p.add_argument("--test_mode", type=str, default="leaveoneout")
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    p.add_argument("--bdcn_weights", type=str, default="")
    p.add_argument("--edge_downscale", type=int, default=1)
    p.add_argument("--edge_thres", type=int, default=0)
    p.add_argument("--real_video", type=str,
                   default="/root/reference/videos/example1.avi",
                   help="no-GT teacher<->student agreement pass over real "
                        "dual-eye frames (the reference's shipped demo clip "
                        "by default; '' disables)")
    p.add_argument("--real_frames", type=int, default=64)
    p.add_argument("--gate_eval_n", type=int, default=256,
                   help="minimum held-out sample count for the FIDELITY "
                        "gate evaluation (synthetic data only): the val "
                        "split is extended to this many samples — same "
                        "seed/distribution, a superset disjoint from "
                        "training — so gate verdicts and their bootstrap "
                        "CIs rest on >= 256 samples instead of the val "
                        "split's 32 (VERDICT r4 #4); 0 keeps the val split")
    p.add_argument("--real_mix", type=int, default=0,
                   help="mix N teacher-pseudo-labeled real eye crops from "
                        "--real_video into the student's TRAINING set (KD "
                        "needs no labels; the teacher's argmax/centers/"
                        "ellipse become the sample annotations) — closes "
                        "the synthetic->real distribution gap the "
                        "real_agreement metric measures; 0 disables")
    return p.parse_args(argv)


def load_teacher_vars(path, teacher, variant, image_size):
    """Teacher variables from an orbax dir, a torch .pkl, or random init."""
    import jax
    import jax.numpy as jnp

    if path == "random":
        h, w = image_size
        x0 = jnp.zeros((1, h, w, 1), jnp.float32)
        return jax.jit(lambda r, a, b: teacher.init(r, a, b, train=False))(
            jax.random.PRNGKey(7), x0, x0)
    if os.path.isdir(path):
        from eghmd_tpu.training.checkpoints import load_checkpoint_variables

        return load_checkpoint_variables(path)
    from eghmd_tpu.utils.torch_convert import load_reference_esfnet_checkpoint

    return jax.tree.map(
        jnp.asarray, load_reference_esfnet_checkpoint(path, variant))


def main(argv=None):
    args = parse_args(argv)

    import json

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from eghmd_tpu.config import (ExperimentConfig, resolve_variant,
                                  scaled_variant)
    from eghmd_tpu.data import DataPipeline
    from eghmd_tpu.models import build_model
    from eghmd_tpu.parallel import batch_sharding
    from eghmd_tpu.training import (DistillConfig, DistillTrainer,
                                    distill_gate, evaluate_fidelity)
    from eghmd_tpu.training.checkpoints import CheckpointManager

    cfg = ExperimentConfig(
        lr=args.lr, prec={16: "bfloat16", 32: "float32"}[args.prec],
        epochs=args.epochs, batchsize=args.batchsize, workers=args.workers,
        setting=args.setting, edge_thres=args.edge_thres,
        edge_downscale=args.edge_downscale,
        image_size=(args.image_height, args.image_width),
        log_dir=args.log_dir,
        mesh_shape=(args.mesh,) if args.mesh else None,
    )

    t_variant = resolve_variant(args.teacher_setting)
    if args.teacher_chz != 32 or args.teacher_growth != 1.2:
        t_variant = scaled_variant(t_variant, args.teacher_chz,
                                   args.teacher_growth)
    s_variant = scaled_variant(resolve_variant(args.setting), args.chz,
                               args.growth)
    teacher = build_model("ritnet_v2", t_variant, cfg.dtype,
                          chz=args.teacher_chz, growth=args.teacher_growth)
    student = build_model("ritnet_v2", s_variant, cfg.dtype,
                          chz=args.chz, growth=args.growth,
                          seg_downscale=args.seg_downscale,
                          input_downscale=args.input_downscale,
                          remat=bool(args.remat))
    if args.input_downscale > 1 and args.init_from_teacher:
        raise SystemExit("--init_from_teacher cannot bootstrap an "
                         "input_downscale student: the regression head's "
                         "flatten width differs from the teacher's "
                         "(use --init_ckpt for a partial bootstrap)")
    if args.init_ckpt and args.init_from_teacher:
        raise SystemExit("--init_ckpt and --init_from_teacher are mutually "
                         "exclusive bootstraps")
    teacher_vars = load_teacher_vars(args.teacher_ckpt, teacher, t_variant,
                                     cfg.image_size)

    # when the student serves with a degraded fast-edge input, the KD
    # target should be the teacher at FULL edge fidelity
    teacher_edge_fn = None
    if args.edge_downscale > 1 and args.bdcn_weights:
        class _FullEdge:
            bdcn_weights = args.bdcn_weights
            edge_downscale = 1
            image_height = args.image_height
            image_width = args.image_width

        teacher_edge_fn = build_edge_fn(_FullEdge, cfg.dtype)

    train_ds, valid_ds, _ = build_datasets(args)
    if args.real_mix:
        if (args.image_height, args.image_width) != (240, 320):
            raise SystemExit("--real_mix requires the 240x320 serving "
                             "geometry (reference evaluate.py:247)")
        from eghmd_tpu.data import ConcatDataset, ListDataset, decode_eye_crops
        from eghmd_tpu.training import pseudo_label_real_samples

        # DISJOINT from the real_agreement eval: that metric scores the
        # clip's first --real_frames frames, so training crops start after
        # them — the reported agreement is on frames the student never saw
        eyes = decode_eye_crops(args.real_video, args.real_mix,
                                skip_frames=args.real_frames)
        if len(eyes):
            # pseudo-label with the teacher at FULL edge fidelity
            label_edge_fn = teacher_edge_fn or build_edge_fn(args, cfg.dtype)
            t_var = resolve_variant(args.teacher_setting)
            real_samples = pseudo_label_real_samples(
                teacher, teacher_vars, eyes, edge_fn=label_edge_fn,
                edge_thres=bool(t_var.edge_thres or args.edge_thres))
            train_ds = ConcatDataset(train_ds, ListDataset(real_samples))
            print(f"mixed {len(real_samples)} teacher-pseudo-labeled real "
                  f"eye crops into the training set")
        else:
            print(f"real_mix: no frames decoded from {args.real_video}; "
                  f"training on synthetic only")
    trainer = DistillTrainer(
        cfg, student, teacher, teacher_vars,
        distill=DistillConfig(args.temperature, args.w_seg, args.w_el,
                              args.w_gt, args.w_center),
        edge_fn=build_edge_fn(args, cfg.dtype),
        teacher_edge_fn=teacher_edge_fn,
    )
    sharding = batch_sharding(trainer.mesh)
    train_pipe = DataPipeline(train_ds, cfg.batchsize, sharding=sharding,
                              shuffle=True, num_workers=cfg.workers)
    valid_pipe = DataPipeline(valid_ds, cfg.batchsize, sharding=sharding,
                              shuffle=False, num_workers=cfg.workers)

    log_dir = os.path.join(cfg.log_dir, "distill", args.expname)
    from eghmd_tpu.utils.logging import dump_run_args

    dump_run_args(log_dir, args)
    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    state, start_epoch = None, 0
    # With --resume 1 but nothing to resume FROM, fall through to the
    # requested init (teacher copy / partial bootstrap) instead of
    # silently training from random weights: a retry wrapper that always
    # passes --resume must not lose the warm start on its first attempt.
    if args.resume and ckpt.latest_epoch() is None:
        if args.init_ckpt or args.init_from_teacher:
            print("--resume: no epoch checkpoint found; running the "
                  "requested initialization instead")
        else:
            print("--resume: no epoch checkpoint found; training from "
                  "scratch")
        args.resume = 0
    if args.init_from_teacher and not args.resume:
        import jax

        from eghmd_tpu.parallel import replicated_sharding

        state = trainer.init_state(next(iter(valid_pipe)))
        same = (jax.tree_util.tree_structure(state.params)
                == jax.tree_util.tree_structure(teacher_vars["params"])
                and all(a.shape == b.shape for a, b in zip(
                    jax.tree.leaves(state.params),
                    jax.tree.leaves(teacher_vars["params"]))))
        if not same:
            raise SystemExit(
                "--init_from_teacher needs an architecture-identical "
                "student (same setting/chz/growth; only serving "
                "downscales may differ)")
        # deep-copy: the student state is DONATED every step while
        # teacher_vars stays a live argument — aliased buffers would be
        # "use after donate" (f(donate(a), a)) on the first step
        import jax.numpy as jnp

        copy = lambda tree: jax.tree.map(lambda t: jnp.array(t, copy=True),
                                         tree)
        state = state._replace(
            params=copy(teacher_vars["params"]),
            batch_stats=copy(teacher_vars.get("batch_stats",
                                              state.batch_stats)))
        state = jax.device_put(state, replicated_sharding(trainer.mesh))
        print("student bootstrapped from teacher weights")
    if args.init_ckpt and not args.resume:
        import jax

        from eghmd_tpu.parallel import replicated_sharding
        from eghmd_tpu.training.checkpoints import partial_bootstrap_state

        state = trainer.init_state(next(iter(valid_pipe)))
        state, copied, total = partial_bootstrap_state(state, args.init_ckpt)
        state = jax.device_put(state, replicated_sharding(trainer.mesh))
        print(f"student partially bootstrapped from {args.init_ckpt}: "
              f"{copied}/{total} leaves copied")
    if args.resume and ckpt.latest_epoch() is not None:
        import jax

        from eghmd_tpu.parallel import replicated_sharding

        last = ckpt.latest_epoch()
        state = trainer.init_state(next(iter(valid_pipe)))
        state = ckpt.restore(state, tag=f"epoch_{last}")
        state = jax.device_put(state, replicated_sharding(trainer.mesh))
        start_epoch = last + 1
        print(f"resumed student from epoch {last}; "
              f"training {cfg.epochs} more epochs")
    if args.gate_only:
        if ckpt.latest_epoch() is None and not os.path.isdir(
                os.path.join(log_dir, "checkpoints", "best")):
            raise SystemExit(f"--gate_only: no checkpoints under {log_dir}")
        state = trainer.init_state(next(iter(valid_pipe)))
    else:
        state, history = trainer.fit(train_pipe, valid_pipe, checkpointer=ckpt,
                                     state=state, start_epoch=start_epoch)

    # Gate the BEST checkpoint — the artifact that would actually serve —
    # not the last epoch's state: epoch-to-epoch noise on the small val
    # split can fail a final state whose best (early-stop-tracked) state
    # passes. restore() prefers the 'best' tag, then the latest epoch.
    gated_tag = "final"
    if os.path.isdir(os.path.join(log_dir, "checkpoints", "best")) \
            or args.gate_only:
        import jax

        from eghmd_tpu.parallel import replicated_sharding

        state = ckpt.restore(state)
        state = jax.device_put(state, replicated_sharding(trainer.mesh))
        gated_tag = "best"

    gate_pipe = valid_pipe
    if ((args.synthetic or args.curObj == "synthetic")
            and args.gate_eval_n > len(valid_ds)):
        # widen the gate's evidence base (host-side cost only): samples are
        # a deterministic function of (seed, idx), so seed=2 with more
        # samples is a SUPERSET of the val split — still disjoint from the
        # training set (seed=1) and test set (seed=3)
        from eghmd_tpu.data import SyntheticEyeDataset

        gate_ds = SyntheticEyeDataset(
            args.gate_eval_n, cfg.image_size, aug=False, seed=2,
            degrade=getattr(args, "synthetic_degrade", 0.0))
        gate_pipe = DataPipeline(gate_ds, cfg.batchsize, sharding=sharding,
                                 shuffle=False, num_workers=cfg.workers)
    fid = evaluate_fidelity(trainer.fidelity_step, state, trainer.teacher_vars,
                            gate_pipe)
    if args.real_video and (args.image_height, args.image_width) == (240, 320):
        # the serving-shaped students only: real frames are preprocessed to
        # the 240x320 serving geometry (reference evaluate.py:247)
        from eghmd_tpu.training import real_frame_agreement

        variant = cfg.variant
        real = real_frame_agreement(
            trainer.student, trainer.teacher, state, trainer.teacher_vars,
            args.real_video, edge_fn=trainer.edge_fn,
            edge_thres=bool(variant.edge_thres or cfg.edge_thres),
            n_frames=args.real_frames,
            teacher_edge_fn=trainer.teacher_edge_fn)
        if real is not None:
            fid.update(real)
    # gate AFTER the real-frame merge: the real-clip center-p50 criterion
    # must see its metric when a real pass ran (VERDICT r3 #2)
    criteria = {}
    accepted = distill_gate(fid, args.max_miou_drop, args.min_agreement,
                            args.max_center_excess, args.max_real_center_p50,
                            criteria_out=criteria)
    record = {"student_chz": args.chz, "student_setting": args.setting,
              "seg_downscale": args.seg_downscale,
              "edge_downscale": args.edge_downscale,
              "input_downscale": args.input_downscale,
              "gated_tag": gated_tag,
              **{k: round(v, 4) if isinstance(v, float) else v
                 for k, v in fid.items()},
              "criteria": criteria,
              "accepted": bool(accepted)}
    print(json.dumps(record))
    # persist the verdict next to the artifact so downstream consumers
    # (bench.py checkpoint auto-discovery) can refuse to serve a student
    # that never passed its gate
    with open(os.path.join(log_dir, "gate.json"), "w") as f:
        json.dump(record, f, indent=1)
    return fid, accepted


if __name__ == "__main__":
    main()
