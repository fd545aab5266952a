"""InstaVariety per-action JSON tracks -> pickled 17-joint motions
(parity: /root/reference/tools/convert_insta.py).

Each clip: per-frame JSON keypoint dicts -> H36M-17 arrays (Belly/Head
zeroed, confidence in channel 2) -> crop_scale -> root-anchored xy ->
zero-confidence rows zeroed.

Usage: python tools/convert_insta.py --name_action <action> [--dataset_root ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IDX2KEY = [
    "Hip", "R Hip", "R Knee", "R Ankle", "L Hip", "L Knee", "L Ankle",
    "Belly", "Neck", "Nose", "Head", "L Shoulder", "L Elbow", "L Wrist",
    "R Shoulder", "R Elbow", "R Wrist",
]


def write_track_tree(dir_action, clips):
    """Write a synthetic InstaVariety track tree (the input format both
    this converter and the reference tools/convert_insta.py consume):
    clips is a list of (relpath "vid/clip", (L, 17, 3) array-or-None)
    with channel layout (x, y, logits) in IDX2KEY joint order. None means
    an empty clip directory (the converters must skip it). Used by
    tools/make_goldens.py and tests/test_converters.py so both sides run
    on bit-identical JSON files."""
    for rel, arr in clips:
        d = os.path.join(dir_action, rel)
        os.makedirs(d, exist_ok=True)
        if arr is None:
            continue
        for t, frame in enumerate(np.asarray(arr)):
            jd = {key: {"x": float(frame[i][0]), "y": float(frame[i][1]),
                        "logits": float(frame[i][2])}
                  for i, key in enumerate(IDX2KEY)}
            with open(os.path.join(d, "%05d.json" % t), "w") as f:
                json.dump(jd, f)


def json2pose(json_dict):
    pose = np.zeros([17, 3])
    for i, key in enumerate(IDX2KEY):
        if key in ("Belly", "Head"):
            continue  # left zero (reference convert_insta.py:64-66)
        item = json_dict[key]
        pose[i] = item["x"], item["y"], item["logits"]
    return pose


def load_clip(motion_path):
    from motionbert_tpu.geometry.transforms import crop_scale

    motion_list = sorted(glob.glob(motion_path + "/*.json"))
    if not motion_list:
        return None
    motion = np.array([json2pose(json.load(open(p))) for p in motion_list])
    motion = crop_scale(motion)
    motion[:, :, :2] = motion[:, :, :2] - motion[0:1, 0:1, :2]
    motion[motion[:, :, 2] == 0] = 0
    return motion


def convert_action(dataset_root, name_action):
    action_motions = []
    dir_action = os.path.join(dataset_root, name_action)
    for name_vid in sorted(os.listdir(dir_action)):
        dir_vid = os.path.join(dir_action, name_vid)
        if not os.path.isdir(dir_vid):
            continue
        for name_clip in sorted(os.listdir(dir_vid)):
            motion = load_clip(os.path.join(dir_vid, name_clip))
            if motion is not None:
                action_motions.append(motion)
        print(f"{name_vid} Done, {len(action_motions)} vids processed")
    out = os.path.join(dir_action, f"{name_action}.pkl")
    with open(out, "wb") as f:
        pickle.dump(action_motions, f)
    print(f"{name_action} Done, {len(action_motions)} vids -> {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--name_action", type=str, required=True)
    p.add_argument("--dataset_root",
                   default="data/Motion2d/InstaVariety/InstaVariety_tracks/")
    a = p.parse_args()
    convert_action(a.dataset_root, a.name_action)
