"""AMASS -> MB3D clip directory converter
(parity: /root/reference/tools/convert_amass.py:21-67).

Reads the per-sequence H36M-17 joints pickle produced by
preprocess_amass.py, remaps real-world axes to camera axes, scales, slices
into 243-frame clips, and writes file-per-clip pkls with data_input=None
(pretraining synthesizes the 2D input from the 3D label on the fly).

Usage: python tools/convert_amass.py [--joints_pkl ...] [--out_root ...]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCALE_FACTOR = 0.298
# real-world -> camera axes (y up -> z forward)
REAL2CAM = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float32)


def amass_sequences_to_clips(joints_all, n_frames=243, data_stride=81):
    """joints_all: list of (17, N, 3) sequences -> (num_clips, n_frames, 17, 3)."""
    from motionbert_tpu.geometry.transforms import split_clips

    joints_cam = []
    vid_list = []
    for i, item in enumerate(joints_all):
        item = np.asarray(item, np.float32)
        vid_list.extend([i] * item.shape[1])
        motion_cam = np.transpose(item, (1, 0, 2)) @ REAL2CAM
        joints_cam.append(motion_cam * SCALE_FACTOR)
    joints_cam_all = np.vstack(joints_cam)
    split_id = split_clips(vid_list, n_frames=n_frames,
                           data_stride=data_stride)
    return joints_cam_all[split_id]


def convert_amass(joints_pkl, out_root, n_frames=243, data_stride=81):
    with open(joints_pkl, "rb") as f:
        joints_all = pickle.load(f)
    clips = amass_sequences_to_clips(joints_all, n_frames, data_stride)
    save_path = os.path.join(out_root, "train")
    os.makedirs(save_path, exist_ok=True)
    for i in range(len(clips)):
        with open(os.path.join(save_path, "%08d.pkl" % i), "wb") as f:
            pickle.dump({"data_input": None, "data_label": clips[i]}, f)
    print(f"wrote {len(clips)} AMASS clips to {save_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--joints_pkl",
                   default="data/AMASS/amass_joints_h36m_60.pkl")
    p.add_argument("--out_root", default="data/motion3d/MB3D_f243s81/AMASS")
    p.add_argument("--n_frames", type=int, default=243)
    p.add_argument("--data_stride", type=int, default=81)
    a = p.parse_args()
    convert_amass(a.joints_pkl, a.out_root, a.n_frames, a.data_stride)
