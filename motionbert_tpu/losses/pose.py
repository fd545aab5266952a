"""3D-pose training losses in pure jnp (jit/grad friendly).

Behavioral parity target: /root/reference/lib/model/loss.py:56-203. All
reductions are full means like the reference; the 16-limb and 18-angle
topologies come from geometry.skeleton. The degenerate T<=1 early-returns
(loss_velocity, loss_limb_var, loss_angle_velocity) are shape-static here:
T is known at trace time, so plain Python conditionals compile away.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from motionbert_tpu.geometry.skeleton import H36M_ANGLE_PAIRS, H36M_LIMBS

_LIMBS = np.asarray(H36M_LIMBS)          # (16, 2)
_ANGLES = np.asarray(H36M_ANGLE_PAIRS)   # (18, 2)


def safe_norm(x, axis=-1):
    """L2 norm with a zero (sub)gradient at 0.

    jnp.linalg.norm has a NaN gradient at exactly 0; torch.norm returns 0
    there. Root-relative pose losses hit this on the root joint every step,
    so the torch subgradient semantics matter (values are identical).
    """
    sq = jnp.sum(x * x, axis=axis)
    positive = sq > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)


def loss_mpjpe(predicted, target):
    """Mean per-joint position error (Protocol-1 as a training loss)."""
    assert predicted.shape == target.shape
    return jnp.mean(safe_norm(predicted - target))


def weighted_mpjpe(predicted, target, w):
    """Per-sample weighted MPJPE; w broadcasts over (N, ...)."""
    assert predicted.shape == target.shape
    return jnp.mean(w * safe_norm(predicted - target))


def loss_2d_weighted(predicted, target, conf):
    """Confidence-weighted 2D reprojection loss for 2D-only data.

    predicted/target: (N, T, 17, C>=2); conf: (N, T, 17, 1).
    Parity: reference loss.py:72-77 (weight the diff, then L2 over xy).
    """
    diff = (predicted[..., :2] - target[..., :2]) * conf
    return jnp.mean(safe_norm(diff))


def n_mpjpe(predicted, target):
    """Scale-normalized MPJPE (optimal per-sample-per-frame scale)."""
    assert predicted.shape == target.shape
    norm_predicted = jnp.mean(
        jnp.sum(predicted ** 2, axis=3, keepdims=True), axis=2, keepdims=True)
    norm_target = jnp.mean(
        jnp.sum(target * predicted, axis=3, keepdims=True), axis=2, keepdims=True)
    scale = norm_target / norm_predicted
    return loss_mpjpe(scale * predicted, target)


def loss_velocity(predicted, target):
    """MPJPE of the temporal first derivative."""
    assert predicted.shape == target.shape
    if predicted.shape[1] <= 1:
        return jnp.asarray(0.0, predicted.dtype)
    vel_p = predicted[:, 1:] - predicted[:, :-1]
    vel_t = target[:, 1:] - target[:, :-1]
    return jnp.mean(safe_norm(vel_p - vel_t))


def get_limb_lens(x):
    """(N, T, 17, 3) -> (N, T, 16) limb lengths."""
    limbs = x[:, :, _LIMBS, :]
    limbs = limbs[:, :, :, 0, :] - limbs[:, :, :, 1, :]
    return safe_norm(limbs)


def loss_limb_var(x):
    """Temporal variance of limb lengths (rigidity prior).

    Matches torch.var's unbiased (ddof=1) estimator (reference loss.py:121).
    """
    if x.shape[1] <= 1:
        return jnp.asarray(0.0, x.dtype)
    limb_lens = get_limb_lens(x)
    return jnp.mean(jnp.var(limb_lens, axis=1, ddof=1))


def loss_limb_gt(x, gt):
    """L1 between predicted and GT limb lengths."""
    return jnp.mean(jnp.abs(get_limb_lens(x) - get_limb_lens(gt)))


def get_angles(x):
    """(N, T, 17, 3) -> (N, T, 18) joint angles between adjacent limbs."""
    eps = 1e-7
    limbs = x[:, :, _LIMBS, :]
    limbs = limbs[:, :, :, 0, :] - limbs[:, :, :, 1, :]
    pairs = limbs[:, :, _ANGLES, :]            # (N, T, 18, 2, 3)
    a, b = pairs[:, :, :, 0, :], pairs[:, :, :, 1, :]
    # cosine similarity with torch's eps semantics (norms clamped at 1e-8)
    na = jnp.maximum(safe_norm(a), 1e-8)
    nb = jnp.maximum(safe_norm(b), 1e-8)
    cos = jnp.sum(a * b, axis=-1) / (na * nb)
    return jnp.arccos(jnp.clip(cos, -1 + eps, 1 - eps))


def loss_angle(x, gt):
    """L1 between predicted and GT joint angles."""
    return jnp.mean(jnp.abs(get_angles(x) - get_angles(gt)))


def loss_angle_velocity(x, gt):
    """L1 of the angle first derivative."""
    assert x.shape == gt.shape
    if x.shape[1] <= 1:
        return jnp.asarray(0.0, x.dtype)
    x_a = get_angles(x)
    gt_a = get_angles(gt)
    x_av = x_a[:, 1:] - x_a[:, :-1]
    gt_av = gt_a[:, 1:] - gt_a[:, :-1]
    return jnp.mean(jnp.abs(x_av - gt_av))


def pose3d_total_loss(predicted, target, lambdas):
    """The 7-term pose3d/pretrain loss (reference train.py:177-191).

    lambdas: dict with lambda_scale, lambda_3d_velocity, lambda_lv,
    lambda_lg, lambda_a, lambda_av. Returns (total, per-term dict).
    """
    terms = {
        "3d_pos": loss_mpjpe(predicted, target),
        "3d_scale": n_mpjpe(predicted, target),
        "3d_velocity": loss_velocity(predicted, target),
        "lv": loss_limb_var(predicted),
        "lg": loss_limb_gt(predicted, target),
        "angle": loss_angle(predicted, target),
        "angle_velocity": loss_angle_velocity(predicted, target),
    }
    total = (
        terms["3d_pos"]
        + lambdas["lambda_scale"] * terms["3d_scale"]
        + lambdas["lambda_3d_velocity"] * terms["3d_velocity"]
        + lambdas["lambda_lv"] * terms["lv"]
        + lambdas["lambda_lg"] * terms["lg"]
        + lambdas["lambda_a"] * terms["angle"]
        + lambdas["lambda_av"] * terms["angle_velocity"]
    )
    terms["total"] = total
    return total, terms


def weighted_bonelen_loss(predict_3d_length, gt_3d_length):
    """(reference loss.py:90-92)"""
    return 0.001 * jnp.mean((predict_3d_length - gt_3d_length) ** 2)


def weighted_boneratio_loss(predict_3d_length, gt_3d_length):
    """(reference loss.py:94-96)"""
    return 0.1 * jnp.mean(
        ((predict_3d_length - gt_3d_length) / gt_3d_length) ** 2)
