"""SMPL regression head + MeshRegressor wrapper.

Behavioral parity target: /root/reference/lib/model/model_mesh.py.
Representation (N, T, J, C) -> per-frame pose branch (FC+BN+ReLU ->
24x6 rot6d residual over the mean pose) and time-pooled shape branch
(mean over T -> 10 betas residual over the mean shape) -> rot6d->rotmat ->
JAX SMPL forward -> vertices x1000 (mm) -> H36M-17 joints via
J_regressor_h36m. Returns {'theta' (72+10), 'verts', 'kp_3d'}.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from motionbert_tpu.geometry.rotations import (
    rot6d_to_rotmat, rotmat_to_angle_axis)
from motionbert_tpu.models.smpl import SMPLModel, smpl_forward

Dtype = Any


class SMPLRegressor(nn.Module):
    smpl_model: SMPLModel
    dim_rep: int = 512
    num_joints: int = 17
    hidden_dim: int = 1024
    dropout_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, deterministic: bool = True, smpl: dict = None):
        """feat: (N, T, J, C) -> dict of (N*T, ...) SMPL outputs.

        smpl: optional SMPLModel.array_pytree() passed as a traced jit
        ARGUMENT — avoids embedding the body-model tensors as executable
        constants (see smpl.SMPLModel.array_pytree). None falls back to
        the module's static model (tests, eager use)."""
        m = (self.smpl_model if smpl is None
             else self.smpl_model.with_arrays(smpl))
        N, T, J, C = feat.shape
        NT = N * T
        feat = feat.reshape(N, T, J * C)

        drop = nn.Dropout(self.dropout_ratio)

        # pose branch: per-frame
        feat_pose = feat.reshape(NT, J * C)
        feat_pose = drop(feat_pose, deterministic=deterministic)
        feat_pose = nn.Dense(self.hidden_dim, dtype=self.dtype,
                             name="fc1")(feat_pose)
        feat_pose = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, dtype=self.dtype,
                                 name="bn1")(feat_pose)
        feat_pose = nn.relu(feat_pose)

        # shape branch: time-pooled (AdaptiveAvgPool over T, model_mesh.py:49-50)
        feat_shape = feat.mean(axis=1)  # (N, J*C)
        feat_shape = drop(feat_shape, deterministic=deterministic)
        feat_shape = nn.Dense(self.hidden_dim, dtype=self.dtype,
                              name="fc2")(feat_shape)
        feat_shape = nn.BatchNorm(use_running_average=deterministic,
                                  momentum=0.9, dtype=self.dtype,
                                  name="bn2")(feat_shape)
        feat_shape = nn.relu(feat_shape)

        # residual heads over the mean params (xavier gain 0.01 init,
        # model_mesh.py:23-24)
        small = nn.initializers.variance_scaling(
            0.01 ** 2, "fan_avg", "uniform")
        init_pose = jnp.asarray(m.mean_pose, jnp.float32)
        init_shape = jnp.asarray(m.mean_shape, jnp.float32)
        pred_pose = nn.Dense(24 * 6, kernel_init=small, dtype=self.dtype,
                             name="head_pose")(feat_pose) + init_pose
        pred_shape = nn.Dense(init_shape.shape[-1], kernel_init=small,
                              dtype=self.dtype,
                              name="head_shape")(feat_shape) + init_shape
        pred_shape = jnp.repeat(pred_shape[:, None], T, axis=1).reshape(NT, -1)

        pred_rotmat = rot6d_to_rotmat(
            pred_pose.astype(jnp.float32).reshape(NT, 24, 6))  # (NT,24,3,3)
        out = smpl_forward(m, pred_shape.astype(jnp.float32),
                           pred_rotmat, pose2rot=False)
        pred_vertices = out["vertices"] * 1000.0
        J_h36m = jnp.asarray(m.J_regressor_h36m)
        pred_joints = jnp.einsum("jv,bvc->bjc", J_h36m, pred_vertices)
        pose_aa = rotmat_to_angle_axis(
            pred_rotmat.reshape(-1, 3, 3)).reshape(NT, 72)
        return {
            "theta": jnp.concatenate([pose_aa, pred_shape], axis=1),
            "verts": pred_vertices,
            "kp_3d": pred_joints,
        }


class MeshRegressor(nn.Module):
    """Backbone + SMPL head; reshapes outputs to (N, T, ...)
    (model_mesh.py:82-101)."""

    backbone: nn.Module
    smpl_model: SMPLModel
    dim_rep: int = 512
    num_joints: int = 17
    hidden_dim: int = 1024
    dropout_ratio: float = 0.5

    def setup(self):
        self.head = SMPLRegressor(
            smpl_model=self.smpl_model, dim_rep=self.dim_rep,
            num_joints=self.num_joints, hidden_dim=self.hidden_dim,
            dropout_ratio=self.dropout_ratio)

    def __call__(self, x, deterministic: bool = True, smpl: dict = None):
        N, T, J, C = x.shape
        feat = self.backbone(x, return_rep=True, deterministic=deterministic)
        feat = feat.reshape(N, T, self.num_joints, -1)
        out = self.head(feat, deterministic=deterministic, smpl=smpl)
        return {
            "theta": out["theta"].reshape(N, T, -1),
            "verts": out["verts"].reshape(N, T, -1, 3),
            "kp_3d": out["kp_3d"].reshape(N, T, -1, 3),
        }
