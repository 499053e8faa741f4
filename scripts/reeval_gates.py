#!/usr/bin/env python3
"""Re-EVALUATE the fidelity gate of every committed distill artifact with
the current gate machinery, then rewrite its gate.json in place.

`scripts/regate_artifacts.py` re-applies the current CRITERIA to metrics
already on disk; this script goes one level deeper and re-runs the gate
EVALUATION itself (cli/distill.py --gate_only on the artifact's best
checkpoint), which the round-5 gate upgrades require because the old
records lack the new measurements entirely (VERDICT r4 #3/#4):

  - n_eval_samples >= 256 (the --gate_eval_n widened synthetic held-out
    superset) instead of the 32-sample val split;
  - iris-center metrics + criteria (reference test.py:235-238 reports
    pupil AND iris center distance first-class);
  - paired-bootstrap CIs on the center-error excess next to the existing
    mIoU-drop CI, so near-bar center verdicts carry uncertainty;
  - the real-pass iris p50 + visibility fraction.

The artifact's own recorded run args drive the evaluation (same serving
shape, edge fidelity, teacher); the previous verdict is preserved as
``accepted_r4`` so demotions/restorations are an explicit diff, not a
rewrite of history.

Usage: python scripts/reeval_gates.py [--artifacts artifacts] [--only NAME]
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# run-bookkeeping args that must NOT be replayed verbatim
_OVERRIDES = {
    "gate_only": "1",
    "resume": "0",
    # the gate evaluation needs no training set mutation / warm start
    "real_mix": "0",
    "init_from_teacher": "0",
    "init_ckpt": "",
}
_DROP = {"log_dir", "expname"}


def _fallback(path, default):
    """Artifacts record the paths of their RUN (e.g. logs/...), which a
    fresh clone no longer has — fall back to the committed copy."""
    if path and (path == "random" or os.path.exists(os.path.join(REPO, path))
                 or os.path.isabs(path) and os.path.exists(path)):
        return path
    return default if os.path.isdir(os.path.join(REPO, default)) else path


def reeval_one(art_dir: str, keep_tmp: bool = False,
               dry_run: bool = False) -> dict | None:
    """Run the current gate evaluation on one artifact dir; return the new
    gate record (not yet merged)."""
    name = os.path.basename(art_dir.rstrip("/"))
    with open(os.path.join(art_dir, "args.json")) as f:
        run_args = json.load(f)["args"]
    ckpts = os.path.join(art_dir, "checkpoints")
    if not os.path.isdir(ckpts):
        print(f"{name}: no checkpoints/; skipped", file=sys.stderr)
        return None

    run_args = dict(run_args, **{k: v for k, v in _OVERRIDES.items()})
    run_args["bdcn_weights"] = _fallback(run_args.get("bdcn_weights", ""),
                                         "artifacts/bdcn/checkpoints")
    run_args["teacher_ckpt"] = _fallback(run_args.get("teacher_ckpt", ""),
                                         "artifacts/teacher/checkpoints")

    tmp = tempfile.mkdtemp(prefix=f"reeval_{name}_")
    try:
        run_dir = os.path.join(tmp, "distill", name)
        os.makedirs(run_dir)
        os.symlink(os.path.abspath(ckpts),
                   os.path.join(run_dir, "checkpoints"))
        cmd = [sys.executable, os.path.join(REPO, "cli", "distill.py"),
               "--log_dir", tmp, "--expname", name]
        for k, v in run_args.items():
            if k in _DROP or v is None:
                continue
            cmd += [f"--{k}", str(v)]
        print(f"== reeval {name}", file=sys.stderr)
        if dry_run:
            print(" ".join(cmd))
            return None
        # the axon compile helper can be OOM-SIGKILLed server-side (HTTP
        # 500 through remote_compile) — transient, so retry before giving
        # the artifact up for the pass
        for attempt in range(3):
            proc = subprocess.run(cmd, cwd=REPO)
            if proc.returncode == 0:
                break
            print(f"{name}: gate_only run failed rc={proc.returncode} "
                  f"(attempt {attempt + 1}/3)", file=sys.stderr)
        if proc.returncode != 0:
            return None
        with open(os.path.join(run_dir, "gate.json")) as f:
            return json.load(f)
    finally:
        if not keep_tmp:
            shutil.rmtree(tmp, ignore_errors=True)


def merge(old: dict, new: dict) -> dict:
    """New measurements + criteria replace the old record; historical
    verdicts are preserved explicitly."""
    out = dict(new)
    if "accepted_miou_only" in old:
        out["accepted_miou_only"] = old["accepted_miou_only"]
    out["accepted_r4"] = bool(old.get("accepted"))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifacts", type=str, default="artifacts")
    p.add_argument("--only", type=str, default="",
                   help="re-evaluate just this artifact name")
    p.add_argument("--dry_run", action="store_true",
                   help="print each gate_only command without running it")
    p.add_argument("--force", action="store_true",
                   help="re-evaluate even artifacts already carrying the "
                        "round-5 record (default: skip them, so a timeout "
                        "mid-queue resumes where it left off)")
    args = p.parse_args(argv)

    results = {}
    for gate_path in sorted(glob.glob(
            os.path.join(args.artifacts, "*", "gate.json"))):
        art_dir = os.path.dirname(gate_path)
        name = os.path.basename(art_dir)
        if args.only and name != args.only:
            continue
        with open(gate_path) as f:
            old = json.load(f)
        if "miou_drop" not in old:  # not a distill gate (e.g. bdcn F1)
            continue
        # re-entry: merge() stamps accepted_r4, so its presence (plus the
        # widened eval set) marks an artifact this script already rewrote
        if (not args.force and not args.only and "accepted_r4" in old
                and old.get("n_eval_samples", 0) >= 256):
            print(f"{name:24s} skip (already re-evaluated)", file=sys.stderr)
            results[name] = {"accepted": old["accepted"], "skipped": True}
            continue
        new = reeval_one(art_dir, dry_run=args.dry_run)
        if new is None:
            if not args.dry_run:
                results[name] = {"error": "reeval failed"}
            continue
        rec = merge(old, new)
        with open(gate_path, "w") as f:
            json.dump(rec, f, indent=1)
        results[name] = {
            "accepted": rec["accepted"], "was_r4": rec["accepted_r4"],
            "n_eval_samples": rec.get("n_eval_samples"),
            "miou_drop": rec.get("miou_drop"),
            "center_excess_ci95": rec.get("center_excess_ci95"),
            "iris_excess_ci95": rec.get("iris_center_excess_ci95"),
        }
        verdict = ("PASS" if rec["accepted"] else
                   "DEMOTED" if rec["accepted_r4"] else "fail (unchanged)")
        print(f"{name:24s} {verdict}", file=sys.stderr)
    print(json.dumps({"reeval": results}))
    return results


if __name__ == "__main__":
    main()
