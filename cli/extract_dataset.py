#!/usr/bin/env python3
"""Dataset-generation driver — raw datasets -> reference-schema H5 + .mat.

One CLI covering the reference's five dataset_generation/ scripts:

    python cli/extract_dataset.py lpw     --path2ds <Datasets> --pic_num 2500
    python cli/extract_dataset.py fuhl    --path2ds <Datasets> --pic_num 2500
    python cli/extract_dataset.py nvgaze  --path2ds <Datasets> --pic_num 2500
    python cli/extract_dataset.py openeds --path2ds <Datasets> --pic_num 2500
    python cli/extract_dataset.py riteyes --path2ds <Datasets>
    python cli/extract_dataset.py selections --out dataset_selections.pkl

Directory layouts match the reference scripts (Extract_TEyeD_LPW_histo.py:78-128,
Extract_TEyeD_FUHL_histo.py:~80-125, Extract_TEyeD_NvGaze_AR_histo.py:~80-120,
ExtractOpenEDS_seg_histo.py:60-110, ExtractRITEyes_general.py:60-175). Archives
land in ``<path2ds>/Histogram`` and master keys in ``<path2ds>/Histogram_mat``
unless overridden.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _out_dirs(args):
    h5_dir = args.out_h5 or os.path.join(args.path2ds, "Histogram")
    mat_dir = args.out_mat or os.path.join(args.path2ds, "Histogram_mat")
    return h5_dir, mat_dir


def _teyed_ann(label_dir, stem):
    return {
        "iris": os.path.join(label_dir, f"{stem}iris_eli.txt"),
        "pupil": os.path.join(label_dir, f"{stem}pupil_eli.txt"),
        "ball": os.path.join(label_dir, f"{stem}eye_ball.txt"),
        "lid": os.path.join(label_dir, f"{stem}lid_lm_2D.txt"),
    }


def run_lpw(args):
    """LPW videos + TEyeD annotations (reference Extract_TEyeD_LPW_histo.py)."""
    from eghmd_tpu.data.generation import (
        extract_teyed_dataset, lpw_file_assignment)

    path_dir = os.path.join(args.path2ds, "LPW")
    path_label = os.path.join(args.path2ds, "LPW-ANNOTATIONS")
    assign = lpw_file_assignment(os.path.join(path_label, "fileassignement.txt"))
    videos = []
    for person in sorted(next(os.walk(path_dir))[1]):
        for vid in sorted(glob.glob(os.path.join(path_dir, person, "*.avi"))):
            vid_id = os.path.splitext(os.path.basename(vid))[0]
            mapped = assign[f"{person}/{vid_id}"]  # e.g. '/LPW_16_1'
            p, i = mapped.split("_")[1], mapped.split("_")[-1]
            videos.append((vid, _teyed_ann(path_label, f"LPW_{p}_{i}.mp4")))
    builder = extract_teyed_dataset("LPW", videos, pic_num=args.pic_num)
    return builder.save(*_out_dirs(args))


def run_fuhl(args):
    """Fuhl videos + TEyeD annotations (reference Extract_TEyeD_FUHL_histo.py)."""
    from eghmd_tpu.data.generation import extract_teyed_dataset

    path_dir = os.path.join(args.path2ds, "Fuhl")
    path_label = os.path.join(args.path2ds, "Fuhl-ANNOTATIONS")
    videos = []
    for vid in sorted(glob.glob(os.path.join(path_dir, "*"))):
        stem = os.path.basename(vid).rsplit(".", 1)[0]
        videos.append((vid, _teyed_ann(path_label, f"{stem}.mp4")))
    builder = extract_teyed_dataset("Fuhl", videos, pic_num=args.pic_num)
    return builder.save(*_out_dirs(args))


def run_nvgaze(args):
    """NvGaze-AR jpg directories + TEyeD annotations
    (reference Extract_TEyeD_NvGaze_AR_histo.py)."""
    from eghmd_tpu.data.generation import extract_teyed_dataset

    path_dir = os.path.join(args.path2ds, "NVGaze")
    path_label = os.path.join(args.path2ds, "NVGaze-ANNOTATIONS")
    videos = []
    for name in sorted(next(os.walk(path_dir))[1], key=lambda s: int(s)):
        d = os.path.join(path_dir, name)

        def frames(d=d):
            from PIL import Image

            for jpg in sorted(os.listdir(d)):
                yield np.asarray(Image.open(os.path.join(d, jpg)).convert("L"))

        videos.append((frames(),
                       _teyed_ann(path_label, f"NVIDIAAR_{int(name)}_1.mp4")))
    builder = extract_teyed_dataset("NVGaze", videos, pic_num=args.pic_num)
    return builder.save(*_out_dirs(args))


def run_openeds(args):
    """OpenEDS semantic-seg (reference ExtractOpenEDS_seg_histo.py)."""
    import json

    import cv2

    from eghmd_tpu.data.generation import ArchiveBuilder, extract_openeds_sample

    builder = ArchiveBuilder("OpenEDS", f"OpenEDS_{args.pic_num}",
                             pic_num=args.pic_num)
    path_openeds = os.path.join(args.path2ds, "OpenEDS")
    for dir_cond in ("train", "validation"):
        path2json = os.path.join(
            path_openeds, f"OpenEDS_{dir_cond}_userID_mapping_to_images.json")
        if not os.path.exists(path2json):
            continue
        im2uid = json.load(open(path2json, "r"))
        path_images = os.path.join(path_openeds, dir_cond, "images")
        path_labels = os.path.join(path_openeds, dir_cond, "labels")
        for pdata in im2uid:
            for im_name_full in pdata["semantic_segmenation_images"]:
                if builder.full:
                    break
                im_name = os.path.splitext(im_name_full)[0]
                I = cv2.imread(os.path.join(path_images, im_name_full), 0)
                lab = np.load(os.path.join(path_labels, im_name + ".npy"))
                extract_openeds_sample(builder, I, lab, im_name_full)
    return builder.save(*_out_dirs(args))


def run_riteyes(args):
    """RIT-Eyes s-general renders (reference ExtractRITEyes_general.py).
    One archive per subset directory."""
    from PIL import Image

    from eghmd_tpu.data.generation import ArchiveBuilder, extract_riteyes_sample

    path_dir = os.path.join(args.path2ds, "s-general")
    subsets = [d for d in sorted(os.listdir(path_dir))
               if os.path.isdir(os.path.join(path_dir, d)) and d != "3d"]
    out = []
    for fname in subsets:
        builder = ArchiveBuilder("riteyes_general", f"riteyes_general_{fname}")
        im_dir = os.path.join(path_dir, fname, "synthetic")
        skin_dir = os.path.join(path_dir, fname, "mask-withskin")
        noskin_dir = os.path.join(path_dir, fname, "mask-withoutskin-noglasses")
        for ele in sorted(glob.glob(os.path.join(im_dir, "*.tif"))):
            name = os.path.split(ele)[1]
            try:
                I = np.asarray(Image.open(ele).convert("L"))
                wsk = np.asarray(Image.open(os.path.join(skin_dir, name)).convert("RGB"))
                nsk = np.asarray(Image.open(os.path.join(noskin_dir, name)).convert("RGB"))
            except Exception:
                print(f"Corrupt data found in {ele}.")
                continue
            extract_riteyes_sample(builder, I, wsk, nsk,
                                   os.path.splitext(name)[0])
        if len(builder):
            out.append(builder.save(*_out_dirs(args)))
    return out


def run_selections(args):
    from eghmd_tpu.data.generation import write_dataset_selections

    sel = write_dataset_selections(args.out, pic_train=args.pic_train,
                                   pic_test=args.pic_test)
    print(f"wrote {args.out}: {sorted(sel['train'])}")
    return sel


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("lpw", "fuhl", "nvgaze", "openeds", "riteyes"):
        sp = sub.add_parser(name)
        sp.add_argument("--path2ds", type=str, required=True)
        sp.add_argument("--pic_num", type=int, default=2500)
        sp.add_argument("--out_h5", type=str, default="")
        sp.add_argument("--out_mat", type=str, default="")
    sp = sub.add_parser("selections")
    sp.add_argument("--out", type=str, default="dataset_selections.pkl")
    sp.add_argument("--pic_train", type=int, default=2500)
    sp.add_argument("--pic_test", type=int, default=11200)
    args = p.parse_args(argv)

    runner = {"lpw": run_lpw, "fuhl": run_fuhl, "nvgaze": run_nvgaze,
              "openeds": run_openeds, "riteyes": run_riteyes,
              "selections": run_selections}[args.cmd]
    res = runner(args)
    print(f"{args.cmd}: done -> {res}")
    return res


if __name__ == "__main__":
    main()
