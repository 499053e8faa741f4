#!/usr/bin/env python3
"""HMD application-data converter — counterpart of reference
process_application_data.py: pupil0/pupil1/gt CSVs -> data.pkl for the
application demo."""

import argparse
import os
import pickle

import pandas as pd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pupil0", required=True)
    p.add_argument("--pupil1", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--out", type=str, default="our_data_test/data.pkl")
    args = p.parse_args(argv)

    data = {
        "pupil0": pd.read_csv(args.pupil0).to_numpy(),
        "pupil1": pd.read_csv(args.pupil1).to_numpy(),
        "gt": pd.read_csv(args.gt).to_numpy(),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(data, f)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k} {v.shape}" for k, v in data.items()))


if __name__ == "__main__":
    main()
