"""Pack an MB3D file-per-clip pickle directory into a native clip store.

One-time conversion; training then reads the packed file via the C++
mmap/threaded-gather path (motionbert_tpu/data/clipstore.py) instead of
unpickling thousands of small files per epoch.

Usage:
    python tools/pack_clips.py --clip_dir data/motion3d/MB3D_f243s81/H36M-SH/train \
        --out data/motion3d/MB3D_f243s81/H36M-SH/train.mbcs
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pack_clip_dir(clip_dir: str, out: str):
    from motionbert_tpu.data.clipstore import write_clipstore

    names = sorted(n for n in os.listdir(clip_dir) if n.endswith(".pkl"))
    if not names:
        raise FileNotFoundError(f"no .pkl clips in {clip_dir}")
    inputs, labels = [], []
    has_input = None
    for name in names:
        with open(os.path.join(clip_dir, name), "rb") as f:
            d = pickle.load(f)
        if has_input is None:
            has_input = d["data_input"] is not None
        elif (d["data_input"] is not None) != has_input:
            raise ValueError(
                f"{name}: data_input presence differs from the first clip — "
                f"mixed stores would silently drop detections")
        labels.append(np.asarray(d["data_label"], np.float32))
        if has_input:
            inputs.append(np.asarray(d["data_input"], np.float32))
    labels = np.stack(labels)
    write_clipstore(out, labels, np.stack(inputs) if has_input else None)
    print(f"packed {len(labels)} clips {labels.shape[1:]} -> {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB, has_input={has_input})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--clip_dir", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    pack_clip_dir(a.clip_dir, a.out)
