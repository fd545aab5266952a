"""Action recognition heads + ActionNet wrapper.

Behavioral parity target: /root/reference/lib/model/model_action.py.
Input is a 2-person skeleton clip (N, M=2, T, J, 3); the backbone runs on
the flattened (N*M) batch via get_representation, the head pools over time,
flattens joints, averages the two persons, and classifies (FC+BN+ReLU+FC)
or embeds (FC + L2-normalize) for metric learning.

BatchNorm runs in the "batch_stats" collection; under SPMD the batch mean
is global automatically (jnp reductions over the sharded batch axis become
cross-device collectives).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from motionbert_tpu.models.dstformer import trunc_normal_init

Dtype = Any


def _pool_feat(feat, dropout, deterministic):
    """(N, M, T, J, C) -> (N, J*C): time mean -> joint flatten -> person mean
    (model_action.py:19-24)."""
    N, M, T, J, C = feat.shape
    feat = dropout(feat, deterministic=deterministic)
    feat = feat.mean(axis=2)          # (N, M, J, C) time pool
    feat = feat.reshape(N, M, J * C)  # flatten joints
    return feat.mean(axis=1)          # person mean


class ActionHeadClassification(nn.Module):
    dropout_ratio: float = 0.0
    dim_rep: int = 512
    num_classes: int = 60
    num_joints: int = 17
    hidden_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_ratio)
        feat = _pool_feat(feat, drop, deterministic)
        feat = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(feat)
        feat = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                            dtype=self.dtype, name="bn")(feat)
        feat = nn.relu(feat)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(feat)


class ActionHeadEmbed(nn.Module):
    dropout_ratio: float = 0.0
    dim_rep: int = 512
    num_joints: int = 17
    hidden_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_ratio)
        feat = _pool_feat(feat, drop, deterministic)
        feat = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(feat)
        # NaN-free F.normalize (this sits on the SupCon train path)
        from motionbert_tpu.geometry.rotations import f_normalize

        return f_normalize(feat)


class ActionNet(nn.Module):
    """Backbone + action head (model_action.py:50-71)."""

    backbone: nn.Module
    dim_rep: int = 512
    num_classes: int = 60
    dropout_ratio: float = 0.0
    version: str = "class"  # "class" | "embed"
    hidden_dim: int = 2048
    num_joints: int = 17

    def setup(self):
        if self.version == "class":
            self.head = ActionHeadClassification(
                dropout_ratio=self.dropout_ratio, dim_rep=self.dim_rep,
                num_classes=self.num_classes, num_joints=self.num_joints,
                hidden_dim=self.hidden_dim)
        elif self.version == "embed":
            self.head = ActionHeadEmbed(
                dropout_ratio=self.dropout_ratio, dim_rep=self.dim_rep,
                hidden_dim=self.hidden_dim, num_joints=self.num_joints)
        else:
            raise ValueError(f"Version Error: {self.version}")

    def __call__(self, x, deterministic: bool = True):
        """x: (N, M, T, J, C) -> logits (N, classes) or embeds (N, hidden)."""
        N, M, T, J, C = x.shape
        x = x.reshape(N * M, T, J, C)
        feat = self.backbone(x, return_rep=True, deterministic=deterministic)
        feat = feat.reshape(N, M, T, J, -1)
        return self.head(feat, deterministic=deterministic)
