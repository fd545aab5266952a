"""Golden parity for rotation conversions and eval metrics."""

import os

import numpy as np
import pytest

from motionbert_tpu.geometry.rotations import (
    batch_rodrigues, quat2mat, rot6d_to_rotmat, rotmat_to_angle_axis,
    flip_thetas,
)
from motionbert_tpu.geometry.procrustes import mpjpe, p_mpjpe, rigid_align

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "rotations.npz"))


def test_batch_rodrigues_golden(g):
    out = np.asarray(batch_rodrigues(g["aa_in"]))
    np.testing.assert_allclose(out, g["rodrigues_out"], atol=1e-5)


def test_quat2mat_golden(g):
    out = np.asarray(quat2mat(g["quat_in"]))
    np.testing.assert_allclose(out, g["quat2mat_out"], atol=1e-5)


def test_rot6d_golden(g):
    out = np.asarray(rot6d_to_rotmat(g["rot6d_in"]))
    np.testing.assert_allclose(out, g["rot6d_out"], atol=1e-5)


def test_rot6d_is_rotation(g):
    R = np.asarray(rot6d_to_rotmat(g["rot6d_in"]))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rotmat_to_angle_axis_golden(g):
    out = np.asarray(rotmat_to_angle_axis(g["rodrigues_out"]))
    np.testing.assert_allclose(out, g["rotmat2aa_out"], atol=1e-4)


def test_aa_roundtrip(g):
    aa = g["aa_in"]
    back = np.asarray(rotmat_to_angle_axis(batch_rodrigues(aa)))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_flip_thetas_golden(g):
    out = np.asarray(flip_thetas(g["thetas_in"]))
    np.testing.assert_allclose(out, g["flip_thetas_out"], atol=1e-6)


def test_mpjpe_p_mpjpe_golden(g):
    np.testing.assert_allclose(mpjpe(g["pmpjpe_pred"], g["pmpjpe_gt"]),
                               g["mpjpe_out"], atol=1e-10)
    np.testing.assert_allclose(p_mpjpe(g["pmpjpe_pred"], g["pmpjpe_gt"]),
                               g["pmpjpe_out"], atol=1e-8)


def test_rigid_align_recovers_similarity():
    rs = np.random.RandomState(0)
    A = rs.normal(size=(17, 3))
    # random rotation
    q = rs.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    B = 1.7 * A @ R.T + np.array([0.3, -2.0, 1.1])
    A2 = rigid_align(A, B)
    np.testing.assert_allclose(A2, B, atol=1e-8)
