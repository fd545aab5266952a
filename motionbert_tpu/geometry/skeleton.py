"""Joint formats, remaps between skeleton conventions, and flip symmetry.

The canonical internal format is H36M-17:
0 root, 1 rhip, 2 rkne, 3 rank, 4 lhip, 5 lkne, 6 lank, 7 belly, 8 neck,
9 nose, 10 head, 11 lsho, 12 lelb, 13 lwri, 14 rsho, 15 relb, 16 rwri.

Remaps are expressed as (17, V) sparse mixing matrices applied with one
matmul — a TPU-friendly formulation (gathers become tiny matmuls that XLA
fuses) that is also exactly equivalent to the reference's per-joint indexing
(behavior parity targets: /root/reference/lib/data/dataset_action.py:31-74
coco2h36m, /root/reference/lib/data/dataset_wild.py:15-65 halpe2h36m,
/root/reference/lib/data/dataset_motion_2d.py:14-74 posetrack2h36m,
/root/reference/lib/utils/utils_data.py:54-66 flip_data).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

NUM_JOINTS_H36M = 17

H36M_LEFT_JOINTS = [4, 5, 6, 11, 12, 13]
H36M_RIGHT_JOINTS = [1, 2, 3, 14, 15, 16]

# Permutation that swaps left<->right joints (identity elsewhere).
_FLIP_PERM = np.arange(NUM_JOINTS_H36M)
_FLIP_PERM[H36M_LEFT_JOINTS + H36M_RIGHT_JOINTS] = np.array(
    H36M_RIGHT_JOINTS + H36M_LEFT_JOINTS
)
H36M_FLIP_PERM = _FLIP_PERM

# 16-limb topology used by limb-length losses (reference loss.py:103-108).
H36M_LIMBS = [
    [0, 1], [1, 2], [2, 3],
    [0, 4], [4, 5], [5, 6],
    [0, 7], [7, 8], [8, 9], [9, 10],
    [8, 11], [11, 12], [12, 13],
    [8, 14], [14, 15], [15, 16],
]

# 18 limb-index pairs used by joint-angle losses (reference loss.py:159-176).
H36M_ANGLE_PAIRS = [
    [0, 3], [0, 6], [3, 6], [0, 1], [1, 2], [3, 4], [4, 5], [6, 7], [7, 10],
    [7, 13], [8, 13], [10, 13], [7, 8], [8, 9], [10, 11], [11, 12], [13, 14],
    [14, 15],
]


def flip_data(data):
    """Horizontal flip: negate x (channel 0) and swap left/right joints.

    data: (..., 17, D) numpy array with x as the first channel of D.
    Matches reference utils_data.py:54-66.
    """
    flipped = np.array(data, copy=True)
    flipped[..., 0] *= -1
    return flipped[..., H36M_FLIP_PERM, :]


def flip_data_jnp(data):
    """jnp version of flip_data, usable inside jit (flip TTA, train-time flip)."""
    flipped = jnp.concatenate([-data[..., :1], data[..., 1:]], axis=-1)
    return flipped[..., jnp.asarray(H36M_FLIP_PERM), :]


def _remap_matrix(rows: dict[int, list[tuple[int, float]]], num_src: int) -> np.ndarray:
    """Build a (17, num_src) mixing matrix from {h36m_joint: [(src, weight)]}."""
    m = np.zeros((NUM_JOINTS_H36M, num_src), dtype=np.float64)
    for dst, srcs in rows.items():
        for src, w in srcs:
            m[dst, src] += w
    return m


# COCO-17 -> H36M-17 (reference dataset_action.py:31-74).
_COCO2H36M = _remap_matrix(
    {
        0: [(11, 0.5), (12, 0.5)],
        1: [(12, 1.0)],
        2: [(14, 1.0)],
        3: [(16, 1.0)],
        4: [(11, 1.0)],
        5: [(13, 1.0)],
        6: [(15, 1.0)],
        # belly = (root + neck)/2 = (coco hips avg + coco shoulders avg)/2
        7: [(11, 0.25), (12, 0.25), (5, 0.25), (6, 0.25)],
        8: [(5, 0.5), (6, 0.5)],
        9: [(0, 1.0)],
        10: [(1, 0.5), (2, 0.5)],
        11: [(5, 1.0)],
        12: [(7, 1.0)],
        13: [(9, 1.0)],
        14: [(6, 1.0)],
        15: [(8, 1.0)],
        16: [(10, 1.0)],
    },
    num_src=17,
)

# Halpe-26 -> H36M-17 (reference dataset_wild.py:15-65).
_HALPE2H36M = _remap_matrix(
    {
        0: [(19, 1.0)],
        1: [(12, 1.0)],
        2: [(14, 1.0)],
        3: [(16, 1.0)],
        4: [(11, 1.0)],
        5: [(13, 1.0)],
        6: [(15, 1.0)],
        7: [(18, 0.5), (19, 0.5)],
        8: [(18, 1.0)],
        9: [(0, 1.0)],
        10: [(17, 1.0)],
        11: [(5, 1.0)],
        12: [(7, 1.0)],
        13: [(9, 1.0)],
        14: [(6, 1.0)],
        15: [(8, 1.0)],
        16: [(10, 1.0)],
    },
    num_src=26,
)

# PoseTrack-17 -> H36M-17 (reference dataset_motion_2d.py:14-74). Linear part;
# the two min() confidence fixups are applied separately in posetrack2h36m.
_POSETRACK2H36M = _remap_matrix(
    {
        0: [(11, 0.5), (12, 0.5)],
        1: [(12, 1.0)],
        2: [(14, 1.0)],
        3: [(16, 1.0)],
        4: [(11, 1.0)],
        5: [(13, 1.0)],
        6: [(15, 1.0)],
        7: [(11, 0.25), (12, 0.25), (1, 0.5)],  # (root + head_bottom)/2
        8: [(1, 1.0)],
        9: [(0, 1.0)],
        10: [(2, 1.0)],
        11: [(5, 1.0)],
        12: [(7, 1.0)],
        13: [(9, 1.0)],
        14: [(6, 1.0)],
        15: [(8, 1.0)],
        16: [(10, 1.0)],
    },
    num_src=17,
)


def _apply_remap(x, matrix):
    """x: (..., V, C) -> (..., 17, C) via einsum with the mixing matrix.

    Always computes in floating point: casting the fractional mixing
    weights (0.5/0.25 rows) to an integer input dtype would truncate them
    to 0 and silently zero every averaged joint (the reference computes
    the averages in float, dataset_action.py:31-74)."""
    x = np.asarray(x)
    dt = x.dtype if np.issubdtype(x.dtype, np.floating) else np.float64
    return np.einsum("jv,...vc->...jc", matrix.astype(dt), x.astype(dt))


def coco2h36m(x):
    """COCO-17 keypoints (..., 17, C) -> H36M-17."""
    return _apply_remap(x, _COCO2H36M)


def halpe2h36m(x):
    """Halpe-26 keypoints (..., 26, C) -> H36M-17."""
    return _apply_remap(x, _HALPE2H36M)


def posetrack2h36m(x):
    """PoseTrack-17 keypoints (T, 17, 3) -> H36M-17 with confidence fixups.

    Root/belly confidences use min() of the contributing joints
    (reference dataset_motion_2d.py:72-73).
    """
    y = _apply_remap(x, _POSETRACK2H36M)
    x = np.asarray(x)
    y[..., 0, 2] = np.minimum(x[..., 11, 2], x[..., 12, 2])
    y[..., 7, 2] = np.minimum(y[..., 0, 2], y[..., 8, 2])
    return y
