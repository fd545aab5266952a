"""Rotation representation conversions in pure jnp (jit/vmap/grad friendly).

Behavioral parity targets in /root/reference/lib/utils/utils_mesh.py:
batch_rodrigues (8-20), quat2mat (23-51), rot6d_to_rotmat (316-330),
rotation_matrix_to_quaternion (139-219), quaternion_to_angle_axis (86-136),
flip_thetas (458-484). All are branch-free formulations using jnp.where so
they compile to straight-line TPU code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# SMPL left/right body-part pairs swapped under horizontal flip
# (reference utils_mesh.py:475).
SMPL_THETA_PAIRS = ((1, 2), (4, 5), (7, 8), (10, 11), (13, 14), (16, 17),
                    (18, 19), (20, 21), (22, 23))

_SMPL_FLIP_PERM = np.arange(24)
for _a, _b in SMPL_THETA_PAIRS:
    _SMPL_FLIP_PERM[_a], _SMPL_FLIP_PERM[_b] = _b, _a
SMPL_FLIP_PERM = _SMPL_FLIP_PERM


def quat2mat(quat):
    """Quaternion (..., 4) as (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(axisang):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Uses the same +1e-8 norm regularization as the reference so outputs
    match numerically (utils_mesh.py:11).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    normalized = axisang / angle
    half = angle * 0.5
    v_cos = jnp.cos(half)
    v_sin = jnp.sin(half)
    quat = jnp.concatenate([v_cos, v_sin * normalized], axis=-1)
    return quat2mat(quat)


def rot6d_to_rotmat(x):
    """6D rotation representation (..., 6) -> rotation matrix (..., 3, 3).

    Gram-Schmidt on the two column vectors (Zhou et al. CVPR'19), matching
    reference utils_mesh.py:316-330 (eps=1e-6 normalize; columns stacked).
    The 6 values are interpreted as a (3, 2) matrix, column-major pairs.
    """
    shape = x.shape[:-1]
    x = x.reshape(-1, 3, 2)
    a1 = x[:, :, 0]
    a2 = x[:, :, 1]

    def _normalize(v, eps=1e-6):
        # the NaN-free normalize idiom lives in ONE place (f_normalize's
        # docstring contract); value-identical at this eps
        return f_normalize(v, eps=eps)

    b1 = _normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    rot = jnp.stack([b1, b2, b3], axis=-1)
    return rot.reshape(shape + (3, 3))


def rotmat_to_quaternion(rotmat, eps=1e-6):
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), (w, x, y, z).

    Branch-free Shepperd's method selecting the numerically largest trace
    variant, matching reference utils_mesh.py:139-219 semantics.
    """
    shape = rotmat.shape[:-2]
    m = rotmat.reshape(-1, 3, 3)
    # The reference transposes (it takes a 3x4 matrix); rmat_t[i, j] = m[j, i].
    mt = jnp.swapaxes(m, -1, -2)
    m00, m01, m02 = mt[:, 0, 0], mt[:, 0, 1], mt[:, 0, 2]
    m10, m11, m12 = mt[:, 1, 0], mt[:, 1, 1], mt[:, 1, 2]
    m20, m21, m22 = mt[:, 2, 0], mt[:, 2, 1], mt[:, 2, 2]

    mask_d2 = m22 < eps
    mask_d0_d1 = m00 > m11
    mask_d0_nd1 = m00 < -m11

    t0 = 1 + m00 - m11 - m22
    q0 = jnp.stack([m12 - m21, t0, m01 + m10, m20 + m02], axis=-1)
    t1 = 1 - m00 + m11 - m22
    q1 = jnp.stack([m20 - m02, m01 + m10, t1, m12 + m21], axis=-1)
    t2 = 1 - m00 - m11 + m22
    q2 = jnp.stack([m01 - m10, m20 + m02, m12 + m21, t2], axis=-1)
    t3 = 1 + m00 + m11 + m22
    q3 = jnp.stack([t3, m12 - m21, m20 - m02, m01 - m10], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)[:, None]
    c1 = (mask_d2 & ~mask_d0_d1)[:, None]
    c2 = (~mask_d2 & mask_d0_nd1)[:, None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[:, None]

    q = jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))
    t = jnp.where(
        c0[:, 0], t0, jnp.where(c1[:, 0], t1, jnp.where(c2[:, 0], t2, t3))
    )
    q = q * (0.5 / jnp.sqrt(t))[:, None]
    return q.reshape(shape + (4,))


def quaternion_to_angle_axis(quaternion):
    """Quaternion (..., 4) -> axis-angle (..., 3) (ceres-style, branch-free).

    Uses the double-where pattern so the identity-rotation branch has clean
    gradients (a bare where(sin_sq>0, t/sin, 2) produces 0*inf = NaN in the
    backward pass exactly at identity, which the SMPL head hits at init).
    """
    q1 = quaternion[..., 1]
    q2 = quaternion[..., 2]
    q3 = quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    positive = sin_sq > 0.0
    sin_sq_safe = jnp.where(positive, sin_sq, 1.0)
    sin_theta = jnp.sqrt(sin_sq_safe)
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k = jnp.where(positive, two_theta / sin_theta,
                  2.0 * jnp.ones_like(sin_theta))
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def rotmat_to_angle_axis(rotmat):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    NaNs are zeroed like reference utils_mesh.py:82.
    """
    aa = quaternion_to_angle_axis(rotmat_to_quaternion(rotmat))
    return jnp.nan_to_num(aa)


def flip_thetas(thetas):
    """Flip SMPL axis-angle poses under horizontal image flip.

    thetas: (..., 24, 3). Negates y/z rotation components and swaps
    left/right parts (reference utils_mesh.py:458-513).
    """
    flipped = jnp.concatenate([thetas[..., :1], -thetas[..., 1:]], axis=-1)
    return flipped[..., jnp.asarray(SMPL_FLIP_PERM), :]


def flip_thetas_np(thetas):
    """Numpy twin of flip_thetas for host-side data augmentation."""
    thetas = np.asarray(thetas)
    flipped = np.concatenate([thetas[..., :1], -thetas[..., 1:]], axis=-1)
    return flipped[..., SMPL_FLIP_PERM, :]


def f_normalize(v, axis=-1, eps=1e-12):
    """torch F.normalize semantics with a NaN-free backward.

    jnp.linalg.norm has a NaN gradient at exactly 0 that an eps clamp does
    NOT block (CLAUDE.md invariant); the sum-square/double-where form
    keeps every gradient finite, and the eps denominator clamp makes a
    zero vector map to zero like torch. The ONE home for this idiom —
    callers (SupCon embed head, SPIN rot6d) must not re-roll it."""
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return v / jnp.maximum(jnp.where(sq > 0, n, 0.0), eps)


def rot6d_to_rotmat_spin(x):
    """SPIN's rot6d variant (reference utils_mesh.py:294-313): F.normalize
    (eps=1e-12 denominator clamp) before Gram-Schmidt — a degenerate
    column yields a zero row like torch, not 0/0 = NaN."""
    shape = x.shape[:-1]
    x = x.reshape(-1, 3, 2)
    a1 = x[:, :, 0]
    a2 = x[:, :, 1]
    b1 = f_normalize(a1)
    inp = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = f_normalize(inp)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1).reshape(shape + (3, 3))


def rectify_pose(pose):
    """Rotate a global SMPL pose by pi about x (fixes "upside down" people;
    reference utils_mesh.py:441-456, without the cv2 dependency).

    pose: (72,) axis-angle; returns a copy with the root rotation composed
    with R_x(pi).
    """
    pose = np.asarray(pose).copy()
    R_mod = np.asarray(batch_rodrigues(
        jnp.asarray([[np.pi, 0.0, 0.0]], dtype=jnp.float32)))[0]
    R_root = np.asarray(batch_rodrigues(
        jnp.asarray(pose[None, :3], dtype=jnp.float32)))[0]
    new_root = R_root @ R_mod
    aa = np.asarray(rotmat_to_angle_axis(jnp.asarray(new_root[None])))[0]
    pose[:3] = aa
    return pose
