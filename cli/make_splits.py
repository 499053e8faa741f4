#!/usr/bin/env python3
"""Offline split builder — produces the ``cond_<DS>.pkl`` split objects the
train/test drivers consume (the reference builds these offline from
CurriculumLib and unpickles them at train.py:86-94 / test.py:271-274).

    python cli/make_splits.py --path2mat <Histogram_mat> --curObj LPW \
        --selections dataset_selections.pkl --mode vanilla \
        --out leaveoneout/cond_LPW.pkl
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path2mat", required=True,
                   help="directory of .mat master keys")
    p.add_argument("--curObj", required=True, help="dataset name, e.g. LPW")
    p.add_argument("--selections", type=str, default="",
                   help="dataset_selections.pkl (cli/extract_dataset.py "
                        "selections); empty -> select by dataset name")
    p.add_argument("--mode", type=str, default="vanilla",
                   help="'vanilla[<P>]' | 'fold<K>' | 'none'")
    p.add_argument("--notest", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    from eghmd_tpu.data.curriculum import build_curriculum_split, save_split

    selections = None
    if args.selections:
        with open(args.selections, "rb") as f:
            selections = pickle.load(f)
    split = build_curriculum_split(
        args.path2mat, args.curObj, selections=selections,
        mode=args.mode, notest=bool(args.notest), seed=args.seed)
    out = args.out or os.path.join("leaveoneout", f"cond_{args.curObj}.pkl")
    save_split(out, split)
    f0 = split.folds[0]
    print(f"wrote {out}: archives={list(map(str, split.arch))}, "
          f"train={len(f0['train_idx'])} valid={len(f0['valid_idx'])} "
          f"test={len(f0['test_idx'])} folds={len(split.folds)}")
    return out


if __name__ == "__main__":
    main()
