"""Structural invariants of the geometry layer. The golden tests pin exact
reference values; these pin properties that must hold for ANY input —
involutions, orthonormality, inverse pairs — so a refactor that happens to
keep the golden inputs right but breaks the math elsewhere still fails.

Reference semantics: /root/reference/lib/utils/utils_data.py (flip_data),
utils_mesh.py (rotation conversions), utils_smpl/vismo flip conventions.
"""

import numpy as np
import pytest

from motionbert_tpu.geometry import flip_data, flip_data_jnp
from motionbert_tpu.geometry.rotations import (
    batch_rodrigues, flip_thetas_np, quat2mat, quaternion_to_angle_axis,
    rot6d_to_rotmat, rot6d_to_rotmat_spin, rotmat_to_angle_axis,
    rotmat_to_quaternion)

RS = np.random.RandomState(20260817)


def _assert_rotation(R, tol=1e-5):
    eye = np.broadcast_to(np.eye(3, dtype=R.dtype), R.shape)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=tol)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=tol)


def test_flip_data_is_an_involution():
    x = RS.randn(4, 9, 17, 3).astype(np.float32)
    np.testing.assert_allclose(flip_data(flip_data(x)), x, rtol=1e-6)


def test_flip_data_jnp_matches_numpy():
    x = RS.randn(2, 5, 17, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(flip_data_jnp(x)), flip_data(x),
                               rtol=1e-6)


def test_flip_thetas_is_an_involution():
    t = (RS.randn(6, 24, 3) * 0.4).astype(np.float32)
    np.testing.assert_allclose(flip_thetas_np(flip_thetas_np(t)), t,
                               rtol=1e-6)


def test_batch_rodrigues_produces_rotations():
    aa = (RS.randn(32, 3) * 1.5).astype(np.float32)
    R = np.asarray(batch_rodrigues(aa)).reshape(-1, 3, 3)
    _assert_rotation(R)


def test_rot6d_to_rotmat_produces_rotations():
    for fn in (rot6d_to_rotmat, rot6d_to_rotmat_spin):
        x = (RS.randn(16, 6) * 2.0).astype(np.float32)
        R = np.asarray(fn(x)).reshape(-1, 3, 3)
        _assert_rotation(R, tol=2e-5)


def test_rotmat_quaternion_round_trip():
    aa = (RS.randn(24, 3) * 1.2).astype(np.float32)
    R = np.asarray(batch_rodrigues(aa)).reshape(-1, 3, 3)
    q = np.asarray(rotmat_to_quaternion(R))
    R2 = np.asarray(quat2mat(q)).reshape(-1, 3, 3)
    np.testing.assert_allclose(R2, R, atol=2e-5)


def test_angle_axis_round_trip():
    # keep |aa| < pi: the angle-axis representation is ambiguous at pi
    aa = np.clip(RS.randn(24, 3) * 0.8, -1.7, 1.7).astype(np.float32)
    aa = aa * (2.8 / np.maximum(np.linalg.norm(aa, axis=-1,
                                               keepdims=True), 2.8))
    R = np.asarray(batch_rodrigues(aa)).reshape(-1, 3, 3)
    aa2 = np.asarray(rotmat_to_angle_axis(R))
    np.testing.assert_allclose(aa2, aa, atol=3e-5)


def test_quaternion_to_angle_axis_inverts_rodrigues():
    aa = np.clip(RS.randn(16, 3) * 0.6, -1.5, 1.5).astype(np.float32)
    R = np.asarray(batch_rodrigues(aa)).reshape(-1, 3, 3)
    q = np.asarray(rotmat_to_quaternion(R))
    aa2 = np.asarray(quaternion_to_angle_axis(q))
    np.testing.assert_allclose(aa2, aa, atol=3e-5)


def test_procrustes_alignment_is_exact_under_similarity_transform():
    from motionbert_tpu.geometry.procrustes import p_mpjpe

    x = RS.randn(3, 17, 3).astype(np.float64)
    # random rotation + scale + translation of the target
    q = RS.randn(4)
    q /= np.linalg.norm(q)
    R = np.asarray(quat2mat(q[None].astype(np.float32))).reshape(3, 3)
    y = 1.7 * x @ R.T.astype(np.float64) + np.array([0.3, -2.0, 5.0])
    # Protocol-2 error between a cloud and its similarity transform is ~0
    err = p_mpjpe(x.astype(np.float32), y.astype(np.float32))
    assert float(np.max(err)) < 1e-4
