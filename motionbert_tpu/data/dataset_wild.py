"""In-the-wild input: AlphaPose (Halpe-26) JSON detections -> H36M clips.

Behavioral parity target: /root/reference/lib/data/dataset_wild.py. Reads
the detector JSON, optionally filters to one tracked person id, remaps
Halpe-26 -> H36M-17, normalizes to [-1, 1] either by video size or by
confidence-aware crop_scale, and chunks the stream into consecutive
clip_len windows (the reference's long-sequence strategy, SURVEY.md §5).
"""

from __future__ import annotations

import json
import math
from typing import Optional, Sequence

import numpy as np

from motionbert_tpu.geometry.skeleton import halpe2h36m
from motionbert_tpu.geometry.transforms import crop_scale


def read_input(json_path: str, vid_size: Optional[Sequence[float]],
               scale_range, focus: Optional[int]):
    with open(json_path, "r") as f:
        results = json.load(f)
    kpts_all = []
    for item in results:
        if focus is not None and item["idx"] != focus:
            continue
        kpts = np.array(item["keypoints"]).reshape(-1, 3)
        kpts_all.append(kpts)
    kpts_all = np.array(kpts_all)
    kpts_all = halpe2h36m(kpts_all)
    motion = kpts_all
    if vid_size:
        w, h = vid_size
        scale = min(w, h) / 2.0
        kpts_all[:, :, :2] = kpts_all[:, :, :2] - np.array([w, h]) / 2.0
        kpts_all[:, :, :2] = kpts_all[:, :, :2] / scale
        motion = kpts_all
    if scale_range:
        motion = crop_scale(kpts_all, scale_range)
    return motion.astype(np.float32)


class WildDetDataset:
    """Chunked clip view over a detection stream. Yields (T<=clip_len, 17, 3)
    numpy arrays; the tail clip may be shorter (the model accepts any
    F <= maxlen)."""

    def __init__(self, json_path: str, clip_len: int = 243, vid_size=None,
                 scale_range=None, focus: Optional[int] = None):
        self.json_path = json_path
        self.clip_len = clip_len
        self.vid_all = read_input(json_path, vid_size, scale_range, focus)

    def __len__(self):
        return math.ceil(len(self.vid_all) / self.clip_len)

    def __getitem__(self, index):
        st = index * self.clip_len
        end = min((index + 1) * self.clip_len, len(self.vid_all))
        return self.vid_all[st:end]
