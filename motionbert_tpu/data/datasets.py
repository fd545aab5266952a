"""Clip datasets + a threaded host pipeline feeding the device.

Parity targets: /root/reference/lib/data/dataset_motion_3d.py (file-per-clip
pose3d dataset), dataset_motion_2d.py (PoseTrack / InstaVariety pretrain
sets). The torch DataLoader (12 worker processes, pin_memory, prefetch) is
replaced by a thread-pool batch loader + device double-buffering: item
decode is numpy/pickle (releases the GIL for I/O), and batches overlap
host->HBM transfer with TPU compute.

Device-side augmentation policy: the random horizontal flip for ALL
training paths (detector-input, synthetic/gt_2d, and the 2D datasets)
happens inside the jitted train step (train/pose3d.py), not here — the
reference flips per-item on the CPU (dataset_motion_3d.py:56-58,
augmentation.py:94-99, dataset_motion_2d.py:119-121).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from motionbert_tpu.core.config import read_pkl
from motionbert_tpu.geometry.transforms import crop_scale, crop_scale_3d


class EpochSeededRNG:
    """Deterministic, thread-safe per-item augmentation RNG.

    The threaded BatchLoader runs __getitem__ on several threads at once;
    a shared RandomState would interleave draws scheduling-dependently
    (and legacy RandomState is not thread-safe). Each item instead derives
    a private RandomState from hash(seed, epoch, index): reproducible
    regardless of worker scheduling, yet varying across epochs. The
    trainers pass the TRUE epoch index through BatchLoader.set_epoch so a
    resumed run draws the same augmentations the uninterrupted run would
    have; _seed defaults to 0, mirroring the reference's fixed
    np.random.seed(0) dataset ctors (dataset_motion_3d.py:16). The
    reference gets its thread-equivalent guarantee from per-process
    DataLoader workers with deterministic seeding (train.py:219-240).
    """

    _seed = 0
    _epoch = 0

    def set_seed(self, seed: int):
        self._seed = int(seed)

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def item_rng(self, index: int) -> np.random.RandomState:
        # boost-style hash_combine, NOT a linear combination: a stride
        # smaller than the dataset would alias (epoch, index+stride) with
        # (epoch+1, index) and replay most augmentation draws
        h = self._seed & 0xFFFFFFFF
        for v in (self._epoch, int(index)):
            h ^= (v + 0x9E3779B9 + ((h << 6) & 0xFFFFFFFF) + (h >> 2)) \
                & 0xFFFFFFFF
        return np.random.RandomState(h & 0xFFFFFFFF)


class MotionDataset3D(EpochSeededRNG):
    """File-per-clip dataset: <data_root>/<subset>/<split>/*.pkl, each
    {"data_input": (T,17,3) or None, "data_label": (T,17,3)}."""

    def __init__(self, args, subset_list: Sequence[str], data_split: str):
        self.data_root = args.data_root
        self.data_split = data_split
        self.flip = bool(args.get("flip", False))
        self.synthetic = bool(args.get("synthetic", False))
        self.gt_2d = bool(args.get("gt_2d", False))
        self.scale_range_pretrain = args.get("scale_range_pretrain", None)
        self.file_list = []
        for subset in subset_list:
            path = os.path.join(self.data_root, subset, data_split)
            for name in sorted(os.listdir(path)):
                self.file_list.append(os.path.join(path, name))

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index):
        motion_file = read_pkl(self.file_list[index])
        motion_3d = np.asarray(motion_file["data_label"], np.float32)
        if self.data_split == "train":
            if self.synthetic or self.gt_2d:
                if self.scale_range_pretrain:
                    motion_3d = crop_scale_3d(
                        motion_3d, self.scale_range_pretrain,
                        rng=self.item_rng(index)).astype(np.float32)
                motion_2d = np.zeros(motion_3d.shape, dtype=np.float32)
                motion_2d[:, :, :2] = motion_3d[:, :, :2]
                motion_2d[:, :, 2] = 1.0  # no detection: GT xy, conf 1
            elif motion_file["data_input"] is not None:
                motion_2d = np.asarray(motion_file["data_input"], np.float32)
                # random flip happens on-device in the train step
            else:
                raise ValueError("Training illegal.")
        elif self.data_split == "test":
            motion_2d = np.asarray(motion_file["data_input"], np.float32)
            if self.gt_2d:
                motion_2d = motion_2d.copy()
                motion_2d[:, :, :2] = motion_3d[:, :, :2]
                motion_2d[:, :, 2] = 1.0
        else:
            raise ValueError("Data split unknown.")
        return motion_2d, motion_3d


class PoseTrackDataset2D:
    """PoseTrack18 2D tracks for pretraining (dataset_motion_2d.py:77-121):
    >=30-frame clips, validity filters, crop_scale, posetrack->h36m remap.
    Returns (motion, motion) pairs — 2D self-supervision."""

    def __init__(self, data_root="data/motion2d/posetrack18_annotations/train/",
                 flip=True, scale_range=(0.25, 1)):
        import json
        from collections import defaultdict

        from motionbert_tpu.geometry.skeleton import posetrack2h36m

        self.flip = flip
        self.rng = np.random.RandomState(0)
        motions = []
        for filename in sorted(os.listdir(data_root)):
            with open(os.path.join(data_root, filename)) as f:
                json_dict = json.load(f)
            tracks = defaultdict(list)
            for annot in json_dict["annotations"]:
                tracks[annot["track_id"]].append(
                    np.array(annot["keypoints"]).reshape(-1, 3))
            motions += list(tracks.values())
        kept = []
        for motion in motions:
            if len(motion) < 30:
                continue
            motion = np.array(motion[:30])
            if np.sum(motion[:, :, 2]) <= 306:  # valid-joint threshold
                continue
            motion = crop_scale(motion, scale_range, rng=self.rng)
            motion = posetrack2h36m(motion)
            motion[motion[:, :, 2] == 0] = 0
            if np.sum(motion[:, 0, 2]) < 30:  # root visible in every frame
                continue
            kept.append(motion.astype(np.float32))
        self.motions_2d = np.array(kept)

    def __len__(self):
        return len(self.motions_2d)

    def __getitem__(self, index):
        m = self.motions_2d[index]
        return m, m


class InstaVDataset2D(EpochSeededRNG):
    """InstaVariety 2D clips (dataset_motion_2d.py:123-147)."""

    def __init__(self, data_root="data/motion2d/InstaVariety", n_frames=81,
                 data_stride=27, flip=True, valid_threshold=0.0,
                 scale_range=(0.25, 1)):
        from motionbert_tpu.geometry.transforms import split_clips

        self.flip = flip
        self.scale_range = scale_range
        motion_all = np.load(os.path.join(data_root, "motion_all.npy"))
        id_all = np.load(os.path.join(data_root, "id_all.npy"))
        split_id = split_clips(id_all, n_frames, data_stride)
        motions_2d = motion_all[split_id]
        valid = motions_2d[:, 0, 0, 2] > valid_threshold
        self.motions_2d = motions_2d[valid]

    def __len__(self):
        return len(self.motions_2d)

    def __getitem__(self, index):
        m = crop_scale(self.motions_2d[index], self.scale_range,
                       rng=self.item_rng(index))
        m[m[:, :, 2] == 0] = 0
        m = m.astype(np.float32)
        return m, m


def _collate(items):
    """Stack a list of samples into batched arrays; recurses into
    tuples and dicts (torch default_collate semantics)."""
    first = items[0]
    if isinstance(first, tuple):
        return tuple(_collate([it[c] for it in items])
                     for c in range(len(first)))
    if isinstance(first, dict):
        return {k: _collate([it[k] for it in items]) for k in first}
    return np.stack(items)


class BatchLoader:
    """Shuffling, batching, background-prefetching loader.

    Yields tuples of stacked numpy arrays. Uses a thread pool for item
    decode (pickle/numpy release the GIL on I/O) and a bounded queue of
    ready batches so host decode overlaps device compute.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = False,
                 seed: int = 0, prefetch: int = 4, sampler=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sampler = sampler  # iterable of indices (overrides shuffle)
        self.rng = np.random.RandomState(seed)
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Pin the augmentation epoch for the NEXT iteration. Trainers
        call this with their true epoch index so resumed runs draw the
        same per-item augmentations; without it, epochs count from 0 at
        each loader lifetime."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        if self.sampler is not None:
            idx = np.fromiter(iter(self.sampler), dtype=np.int64)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            b = idx[i:i + self.batch_size]
            if self.drop_last and len(b) < self.batch_size:
                return
            yield b

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # per-epoch augmentation seeding for datasets that derive their
        # item RNG from (seed, epoch, index) — see EpochSeededRNG
        set_epoch = getattr(self.dataset, "set_epoch", None)
        if set_epoch is not None:
            set_epoch(self._epoch)
        self._epoch += 1

        # fast path: datasets with a native batch gather (data.clipstore)
        get_batch = getattr(self.dataset, "get_batch", None)

        def put(item) -> bool:
            # bounded put that aborts when the consumer went away, so an
            # abandoned iterator can't leave this thread pinned on q.put
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # the thread pool only exists for per-item decode; batch-gather
            # datasets never touch it
            pool = (cf.ThreadPoolExecutor(self.num_workers)
                    if get_batch is None else None)
            try:
                for b in self._batches():
                    if stop.is_set():
                        return
                    if get_batch is not None:
                        batch = get_batch(b)
                    else:
                        items = list(pool.map(self.dataset.__getitem__, b))
                        batch = _collate(items)
                    if not put(batch):
                        return
            except BaseException as e:  # surface in the consumer — a
                put(e)                  # swallowed error would silently
                return                  # truncate the epoch
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)
                put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # drain so the producer's final put lands
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Move batches to device ahead of consumption (double buffering)."""
    import jax

    buf = []
    for batch in iterator:
        if sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        buf.append(batch)
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
