"""Mesh recovery loss (parity: /root/reference/lib/model/loss_mesh.py).

Root-relative keypoint losses (the 7 pose terms) + SMPL parameter losses:
axis-angle -> rotmat MSE/L1 and betas MSE/L1, plus a theta-norm regularizer.
Weighted per-config lambdas like reference train_mesh.py:180-189.
"""

from __future__ import annotations

import jax.numpy as jnp

from motionbert_tpu.geometry.rotations import batch_rodrigues
from motionbert_tpu.losses.pose import (
    loss_angle, loss_angle_velocity, loss_limb_gt, loss_limb_var, loss_mpjpe,
    loss_velocity, n_mpjpe, safe_norm)


def mesh_loss_terms(smpl_output: dict, data_gt: dict, loss_type: str = "L1"):
    """smpl_output/data_gt: dicts with theta (N,T,82), kp_3d (N,T,17,3).

    Returns the reference's loss_dict (loss_mesh.py:40-55).
    """
    crit = (lambda a, b: jnp.mean(jnp.abs(a - b))) if loss_type == "L1" else \
        (lambda a, b: jnp.mean((a - b) ** 2))

    reduce = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
    gt_theta = reduce(data_gt["theta"])
    pred_theta = reduce(smpl_output["theta"])

    preds_local = smpl_output["kp_3d"] - smpl_output["kp_3d"][:, :, 0:1, :]
    gt_local = data_gt["kp_3d"] - data_gt["kp_3d"][:, :, 0:1, :]

    real_pose, real_shape = gt_theta[:, :72], gt_theta[:, 72:]
    pred_pose, pred_shape = pred_theta[:, :72], pred_theta[:, 72:]

    pred_rotmat = batch_rodrigues(pred_pose.reshape(-1, 3)).reshape(
        -1, 24, 3, 3)
    gt_rotmat = batch_rodrigues(real_pose.reshape(-1, 3)).reshape(
        -1, 24, 3, 3)

    return {
        "loss_3d_pos": loss_mpjpe(preds_local, gt_local),
        "loss_3d_scale": n_mpjpe(preds_local, gt_local),
        "loss_3d_velocity": loss_velocity(preds_local, gt_local),
        "loss_lv": loss_limb_var(preds_local),
        "loss_lg": loss_limb_gt(preds_local, gt_local),
        "loss_a": loss_angle(preds_local, gt_local),
        "loss_av": loss_angle_velocity(preds_local, gt_local),
        "loss_pose": crit(pred_rotmat, gt_rotmat),
        "loss_shape": crit(pred_shape, real_shape),
        # safe_norm: a zero theta row would NaN the whole batch's gradient
        # through jnp.linalg.norm (CLAUDE.md invariant)
        "loss_norm": jnp.mean(safe_norm(pred_theta)),
    }


# the 10 required loss weights (reference train_mesh.py:179-189)
LAMBDA_KEYS = ("lambda_3d", "lambda_scale", "lambda_3dv", "lambda_lv",
               "lambda_lg", "lambda_a", "lambda_av", "lambda_pose",
               "lambda_shape", "lambda_norm")


def mesh_total_loss(smpl_output, data_gt, lambdas, loss_type="L1"):
    """Weighted sum (reference train_mesh.py:179-189). Returns (total, terms).

    Every LAMBDA_KEYS entry is REQUIRED — a missing/misspelled key raises
    like the reference's attribute access does, instead of silently
    training with that term weighted 0."""
    terms = mesh_loss_terms(smpl_output, data_gt, loss_type)
    total = (
        lambdas["lambda_3d"] * terms["loss_3d_pos"]
        + lambdas["lambda_scale"] * terms["loss_3d_scale"]
        + lambdas["lambda_3dv"] * terms["loss_3d_velocity"]
        + lambdas["lambda_lv"] * terms["loss_lv"]
        + lambdas["lambda_lg"] * terms["loss_lg"]
        + lambdas["lambda_a"] * terms["loss_a"]
        + lambdas["lambda_av"] * terms["loss_av"]
        + lambdas["lambda_pose"] * terms["loss_pose"]
        + lambdas["lambda_shape"] * terms["loss_shape"]
        + lambdas["lambda_norm"] * terms["loss_norm"]
    )
    terms["total"] = total
    return total, terms


def evaluate_mesh(results):
    """Final mesh metrics: MPVE, MPJPE-14/17, PA-MPJPE-14/17
    (parity: reference utils_mesh.py:395-438)."""
    import numpy as np

    from motionbert_tpu.geometry.procrustes import rigid_align

    pred_verts = results["verts"].reshape(-1, results["verts"].shape[-2], 3)
    target_verts = results["verts_gt"].reshape(
        -1, results["verts_gt"].shape[-2], 3)
    pred_j3ds = results["kp_3d"].reshape(-1, 17, 3)
    target_j3ds = results["kp_3d_gt"].reshape(-1, 17, 3)
    num_samples = pred_j3ds.shape[0]

    pred_verts = pred_verts - pred_j3ds[:, :1, :]
    target_verts = target_verts - target_j3ds[:, :1, :]
    mpve = np.mean(np.mean(np.sqrt(
        np.square(pred_verts - target_verts).sum(axis=2)), axis=1))

    h36m_17_to_14 = (1, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15, 16)
    pred_17 = pred_j3ds - pred_j3ds[:, :1, :]
    target_17 = target_j3ds - target_j3ds[:, :1, :]
    pred_14 = pred_17[:, h36m_17_to_14, :].copy()
    target_14 = target_17[:, h36m_17_to_14, :].copy()

    mpjpe = np.mean(np.sqrt(np.square(pred_14 - target_14).sum(axis=2)),
                    axis=1)
    mpjpe_17j = np.mean(np.sqrt(np.square(pred_17 - target_17).sum(axis=2)),
                        axis=1)

    pa_14 = np.array([rigid_align(pred_14[n], target_14[n])
                      for n in range(num_samples)])
    pa_17 = np.array([rigid_align(pred_17[n], target_17[n])
                      for n in range(num_samples)])
    pa_mpjpe = np.mean(np.sqrt(np.square(pa_14 - target_14).sum(axis=2)),
                       axis=1)
    pa_mpjpe_17j = np.mean(np.sqrt(np.square(pa_17 - target_17).sum(axis=2)),
                           axis=1)
    return {
        "mpve": float(mpve.mean()),
        "mpjpe": float(mpjpe.mean()),
        "pa_mpjpe": float(pa_mpjpe.mean()),
        "mpjpe_17j": float(mpjpe_17j.mean()),
        "pa_mpjpe_17j": float(pa_mpjpe_17j.mean()),
    }


def compute_error(smpl_output, data_gt):
    """Batch-mean MPJPE/MPVE, root-relative (reference utils_mesh.py:357-374).

    Returns (mpjpe, mpve) scalars in the units of the inputs (mm).
    """
    mpjpes, mpves = compute_error_frames(smpl_output, data_gt)
    return mpjpes.mean(), mpves.mean()


def compute_error_frames(smpl_output, data_gt):
    """Per-sample MPJPE/MPVE (reference utils_mesh.py:376-393)."""
    import numpy as np

    pv = np.asarray(smpl_output["verts"]).reshape(
        -1, smpl_output["verts"].shape[-2], 3)
    tv = np.asarray(data_gt["verts"]).reshape(-1, data_gt["verts"].shape[-2], 3)
    pj = np.asarray(smpl_output["kp_3d"]).reshape(-1, 17, 3)
    tj = np.asarray(data_gt["kp_3d"]).reshape(-1, 17, 3)
    pv = pv - pj[:, :1]
    tv = tv - tj[:, :1]
    mpves = np.sqrt(((pv - tv) ** 2).sum(-1)).mean(-1)
    pj = pj - pj[:, :1]
    tj = tj - tj[:, :1]
    mpjpes = np.sqrt(((pj - tj) ** 2).sum(-1)).mean(-1)
    return mpjpes, mpves
