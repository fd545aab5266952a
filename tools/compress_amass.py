"""Downsample raw AMASS npz sequences to a uniform 60 fps
(parity: /root/reference/tools/compress_amass.py).

Walks the raw AMASS directory tree, strides every sequence down to
target_fps, logs per-file stats to fps.csv, and pickles the list of
downsampled motion dicts. Unreadable files are skipped with a warning
(the reference silently swallows all exceptions; we at least report them).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def compress_amass(raw_dir, processed_dir, out_pkl, csv_path,
                   target_fps=60):
    os.makedirs(processed_dir, exist_ok=True)
    files = []
    for root, _, names in os.walk(raw_dir):
        for name in names:
            files.append(os.path.join(root, name))
    print("files:", len(files))

    fnames, all_motions, length = [], [], 0
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    with open(csv_path, "w") as f:
        print("fname_new, len_ori, fps, len_new", file=f)
        for fname in sorted(files):
            try:
                x = dict(np.load(fname))
                fps = x["mocap_framerate"]
                len_ori = len(x["trans"])
                stride = round(float(fps) / target_fps)
                x["mocap_framerate"] = target_fps
                for key in ("trans", "dmpls", "poses"):
                    if key in x:
                        x[key] = x[key][::stride]
                fname_new = "_".join(
                    os.path.relpath(fname, raw_dir).split(os.sep))
                len_new = len(x["trans"])
                length += len_new
                print(f"{fname_new} , {len_ori} , {fps} , {len_new}", file=f)
                fnames.append(fname_new)
                all_motions.append(x)
                np.savez(os.path.join(processed_dir, fname_new), **x)
            except Exception as e:
                print(f"WARNING: skipping {fname}: {e}")
    print("poseFrame:", length)
    print("motions:", len(fnames))
    with open(out_pkl, "wb") as f:
        pickle.dump(all_motions, f)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--raw_dir", default="data/AMASS/amass_202203/")
    p.add_argument("--processed_dir", default="data/AMASS/amass_fps60")
    p.add_argument("--out_pkl", default="data/AMASS/all_motions_fps60.pkl")
    p.add_argument("--csv", default="data/AMASS/fps.csv")
    p.add_argument("--target_fps", type=int, default=60)
    a = p.parse_args()
    compress_amass(a.raw_dir, a.processed_dir, a.out_pkl, a.csv, a.target_fps)
