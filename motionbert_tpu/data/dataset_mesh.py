"""Mesh recovery datasets: 2D clips + on-the-fly SMPL ground-truth synthesis.

Behavioral parity target: /root/reference/lib/data/dataset_mesh.py. Per
clip: normalized 2D detections + GT SMPL pose/shape; the GT vertices and
regressed 17 joints are synthesized by the (host-side numpy) SMPL forward,
root-relative, in mm. Train-time flip augments the 2D and the SMPL thetas
jointly (flip_data + flip_thetas).
"""

from __future__ import annotations

import numpy as np

from motionbert_tpu.data.datasets import EpochSeededRNG
from motionbert_tpu.data.readers import DataReaderH36M, DataReaderMesh
from motionbert_tpu.geometry.rotations import flip_thetas_np
from motionbert_tpu.geometry.skeleton import flip_data
from motionbert_tpu.models.smpl import SMPLModel, smpl_forward_np


class SMPLDataset:
    def __init__(self, args, data_split: str, dataset: str,
                 smpl_model: SMPLModel):
        np.random.seed(0)
        self.clip_len = args.clip_len
        self.data_split = data_split
        self.smpl = smpl_model
        if dataset == "h36m":
            datareader = DataReaderH36M(
                n_frames=self.clip_len, sample_stride=args.sample_stride,
                data_stride_train=args.data_stride,
                data_stride_test=self.clip_len, dt_root=args.data_root,
                dt_file=args.dt_file_h36m)
        elif dataset == "coco":
            datareader = DataReaderMesh(
                n_frames=1, sample_stride=args.sample_stride,
                data_stride_train=1, data_stride_test=1,
                dt_root=args.data_root, dt_file=args.dt_file_coco,
                res=(640, 640))
        elif dataset == "pw3d":
            datareader = DataReaderMesh(
                n_frames=self.clip_len, sample_stride=args.sample_stride,
                data_stride_train=args.data_stride,
                data_stride_test=self.clip_len, dt_root=args.data_root,
                dt_file=args.dt_file_pw3d, res=(1920, 1920))
        else:
            raise ValueError(f"Mesh dataset undefined: {dataset}")

        split_train, split_test = datareader.get_split_id()
        train_data, test_data = datareader.read_2d()
        # slice only the selected split (the other fancy-index would copy
        # a (n_clips, T, 17, 3) array just to throw it away)
        split = split_train if data_split == "train" else split_test
        if data_split not in ("train", "test"):
            raise ValueError(f"Data split unknown: {data_split!r}")
        self.motion_2d = (train_data if data_split == "train"
                          else test_data)[split]
        dt = datareader.dt_dataset
        self.motion_smpl_3d = {
            "pose": dt[data_split]["smpl_pose"][split],
            "shape": dt[data_split]["smpl_shape"][split],
        }

    def __len__(self):
        return len(self.motion_2d)

    def __getitem__(self, index):
        raise NotImplementedError


class MotionSMPL(SMPLDataset, EpochSeededRNG):
    def __init__(self, args, data_split, dataset, smpl_model):
        super().__init__(args, data_split, dataset, smpl_model)
        self.flip = bool(args.get("flip", False))

    def __getitem__(self, index):
        motion_2d = self.motion_2d[index].copy()  # (T, 17, 3)
        motion_2d[:, :, 2] = np.clip(motion_2d[:, :, 2], 0, 1)
        pose = self.motion_smpl_3d["pose"][index].reshape(-1, 24, 3)
        shape = self.motion_smpl_3d["shape"][index].reshape(-1, 10)

        if self.data_split == "train" and self.flip and \
                self.item_rng(index).random() > 0.5:
            motion_2d = flip_data(motion_2d)
            pose = flip_thetas_np(pose)

        # f32 LBS like the batch path (and the reference's torch SMPL,
        # dataset_mesh.py:79-90); f32-vs-f64 delta is ~1e-3 mm
        out = smpl_forward_np(self.smpl, shape.astype(np.float32),
                              pose.reshape(-1, 72).astype(np.float32),
                              dtype=np.float32)
        verts = out["vertices"] * 1000.0  # mm
        kp = self.smpl.J_regressor_h36m @ verts  # (17,V)@(b,V,3)->(b,17,3)
        verts = verts - kp[:, :1, :]
        kp = kp - kp[:, :1, :]
        theta = np.concatenate(
            [pose.reshape(-1, 72), shape], axis=-1).astype(np.float32)
        return motion_2d.astype(np.float32), {
            "theta": theta, "kp_3d": kp.astype(np.float32),
            "verts": verts.astype(np.float32)}

    def get_batch(self, indices):
        """Vectorized batch gather: ONE smpl_forward_np call over all
        clips' frames instead of one per clip. The per-item path starves
        the device at production batch sizes (GIL-bound ~140 clips/s vs
        ~790 consumed, tools/bench_loader.py); the batched LBS runs in
        large BLAS ops that release the GIL. BatchLoader auto-detects this
        method. Matches __getitem__'s outputs exactly (same f32 LBS, same
        per-(epoch, index) flip RNG — see EpochSeededRNG)."""
        indices = np.asarray(indices)
        motion_2d = self.motion_2d[indices].copy()       # (B, T, 17, 3)
        motion_2d[..., 2] = np.clip(motion_2d[..., 2], 0, 1)
        B = len(indices)
        pose = self.motion_smpl_3d["pose"][indices].reshape(B, -1, 24, 3)
        shape = self.motion_smpl_3d["shape"][indices].reshape(B, -1, 10)
        T = pose.shape[1]

        if self.data_split == "train" and self.flip:
            for i, idx in enumerate(indices):
                if self.item_rng(int(idx)).random() > 0.5:
                    motion_2d[i] = flip_data(motion_2d[i])
                    pose[i] = flip_thetas_np(pose[i])

        out = smpl_forward_np(self.smpl,
                              shape.reshape(B * T, 10).astype(np.float32),
                              pose.reshape(B * T, 72).astype(np.float32),
                              dtype=np.float32)
        verts = out["vertices"] * 1000.0  # mm
        kp = self.smpl.J_regressor_h36m @ verts  # GEMM, not loop-einsum
        verts = verts - kp[:, :1, :]
        kp = kp - kp[:, :1, :]
        theta = np.concatenate(
            [pose.reshape(B, T, 72), shape.reshape(B, T, 10)],
            axis=-1).astype(np.float32)
        return motion_2d.astype(np.float32), {
            "theta": theta,
            "kp_3d": kp.reshape(B, T, -1, 3).astype(np.float32),
            "verts": verts.reshape(B, T, -1, 3).astype(np.float32)}
