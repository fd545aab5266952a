"""Numpy eval-protocol error metrics: MPJPE (P1), Procrustes-aligned (P2).

Behavioral parity targets: /root/reference/lib/model/loss.py:8-51 (mpjpe,
p_mpjpe) and /root/reference/lib/utils/utils_mesh.py:333-355
(rigid_transform_3D / rigid_align). These run on the host at eval time,
vectorized over frames with batched SVD.
"""

from __future__ import annotations

import numpy as np


def mpjpe(predicted, target):
    """Protocol-1 error: mean per-joint Euclidean distance, per frame.

    predicted/target: (T, 17, 3) -> (T,) per-frame means.
    """
    assert predicted.shape == target.shape
    return np.mean(
        np.linalg.norm(predicted - target, axis=len(target.shape) - 1), axis=1
    )


def p_mpjpe(predicted, target):
    """Protocol-2 error: MPJPE after similarity (Procrustes) alignment.

    predicted/target: (T, 17, 3) -> (T,). Batched SVD with reflection fix.
    """
    assert predicted.shape == target.shape

    muX = np.mean(target, axis=1, keepdims=True)
    muY = np.mean(predicted, axis=1, keepdims=True)
    X0 = target - muX
    Y0 = predicted - muY
    normX = np.sqrt(np.sum(X0 ** 2, axis=(1, 2), keepdims=True))
    normY = np.sqrt(np.sum(Y0 ** 2, axis=(1, 2), keepdims=True))
    X0 /= normX
    Y0 /= normY

    H = np.matmul(X0.transpose(0, 2, 1), Y0)
    U, s, Vt = np.linalg.svd(H)
    V = Vt.transpose(0, 2, 1)
    R = np.matmul(V, U.transpose(0, 2, 1))

    # Fix improper rotations (reflections): flip the last singular vector.
    sign_detR = np.sign(np.expand_dims(np.linalg.det(R), axis=1))
    V[:, :, -1] *= sign_detR
    s[:, -1] *= sign_detR.flatten()
    R = np.matmul(V, U.transpose(0, 2, 1))

    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)
    a = tr * normX / normY
    t = muX - a * np.matmul(muY, R)
    predicted_aligned = a * np.matmul(predicted, R) + t
    return np.mean(
        np.linalg.norm(predicted_aligned - target, axis=len(target.shape) - 1),
        axis=1,
    )


def rigid_transform_3d(A, B):
    """Optimal similarity transform (c, R, t) aligning A -> B. A, B: (n, 3)."""
    n, _ = A.shape
    centroid_A = np.mean(A, axis=0)
    centroid_B = np.mean(B, axis=0)
    H = np.dot((A - centroid_A).T, B - centroid_B) / n
    U, s, V = np.linalg.svd(H)
    R = np.dot(V.T, U.T)
    if np.linalg.det(R) < 0:
        s[-1] = -s[-1]
        V[2] = -V[2]
        R = np.dot(V.T, U.T)
    varP = np.var(A, axis=0).sum()
    c = 1 / varP * np.sum(s)
    t = -np.dot(c * R, centroid_A.T) + centroid_B.T
    return c, R, t


def rigid_align(A, B):
    """Return A Procrustes-aligned onto B. A, B: (n, 3)."""
    c, R, t = rigid_transform_3d(A, B)
    return (np.dot(c * R, A.T)).T + t
