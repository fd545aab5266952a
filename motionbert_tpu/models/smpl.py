"""SMPL body model in pure JAX: blend shapes + kinematic chain + LBS.

This replaces the reference's only heavyweight native dependency (the
`smplx` package wrapped in /root/reference/lib/utils/utils_smpl.py). The
whole forward is gathers + einsums — exactly the XLA-friendly formulation
(SURVEY.md §2.1 "SMPL layer" row):

    v_shaped = v_template + shapedirs . betas
    J        = J_regressor @ v_shaped
    v_posed  = v_shaped + posedirs . vec(R[1:] - I)
    A_k      = A_parent(k) . [R_k | t_k]        (kinematic chain, lax.scan)
    verts    = (sum_k w_vk A'_k) . v_posed       (linear blend skinning)

Model data loads from an .npz produced by tools/convert_smpl.py out of the
official SMPL_NEUTRAL.pkl (user-licensed download, like the reference's
data/mesh setup). A synthetic model generator exists for tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionbert_tpu.geometry.rotations import batch_rodrigues

# SMPL kinematic tree: parent of each of the 24 joints (root = -1)
SMPL_PARENTS = np.array([
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
    19, 20, 21,
])

NUM_JOINTS = 24


@dataclass(frozen=True)
class SMPLModel:
    """Static SMPL model tensors (numpy; closed over by jitted fns)."""

    v_template: np.ndarray        # (V, 3)
    shapedirs: np.ndarray         # (V, 3, n_betas)
    posedirs: np.ndarray          # (V, 3, 207)
    J_regressor: np.ndarray       # (24, V)
    lbs_weights: np.ndarray       # (V, 24)
    parents: np.ndarray = field(default_factory=lambda: SMPL_PARENTS)
    faces: Optional[np.ndarray] = None            # (F, 3)
    J_regressor_h36m: Optional[np.ndarray] = None  # (17, V)
    J_regressor_extra: Optional[np.ndarray] = None
    mean_pose: Optional[np.ndarray] = None         # (144,) rot6d mean params
    mean_shape: Optional[np.ndarray] = None        # (10,)

    # float tensors that participate in jitted forwards. The kinematic
    # `parents` (python-level indexing at trace time) and `faces`
    # (visualization only) stay static.
    _ARRAY_FIELDS = ("v_template", "shapedirs", "posedirs", "J_regressor",
                     "lbs_weights", "J_regressor_h36m", "J_regressor_extra",
                     "mean_pose", "mean_shape")

    def array_pytree(self) -> dict:
        """The model's float tensors as a dict of device arrays — pass this
        through jit as an ARGUMENT (and rebuild with `with_arrays` inside
        the trace) instead of closing jitted fns over the SMPLModel: the
        real 6890-vert model is ~19 MB of tensors, and closed-over arrays
        embed as constants in every serialized executable, which the
        remote compile service re-uploads per program (CLAUDE.md)."""
        return {k: jnp.asarray(getattr(self, k))
                for k in self._ARRAY_FIELDS if getattr(self, k) is not None}

    def with_arrays(self, arrays: dict) -> "SMPLModel":
        """A copy with the float tensors replaced (e.g. by tracers from an
        `array_pytree()` jit argument)."""
        from dataclasses import replace
        return replace(self, **arrays)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @classmethod
    def from_npz(cls, path: str) -> "SMPLModel":
        z = np.load(path, allow_pickle=False)
        opt = lambda k: np.asarray(z[k], np.float32) if k in z.files else None
        return cls(
            v_template=np.asarray(z["v_template"], np.float32),
            shapedirs=np.asarray(z["shapedirs"], np.float32),
            posedirs=np.asarray(z["posedirs"], np.float32),
            J_regressor=np.asarray(z["J_regressor"], np.float32),
            lbs_weights=np.asarray(z["lbs_weights"], np.float32),
            parents=(np.asarray(z["parents"], np.int64)
                     if "parents" in z.files else SMPL_PARENTS),
            faces=(np.asarray(z["faces"], np.int64)
                   if "faces" in z.files else None),
            J_regressor_h36m=opt("J_regressor_h36m"),
            J_regressor_extra=opt("J_regressor_extra"),
            mean_pose=opt("mean_pose"),
            mean_shape=opt("mean_shape"),
        )

    @classmethod
    def synthetic(cls, num_verts: int = 128, num_betas: int = 10,
                  seed: int = 0) -> "SMPLModel":
        """A small random-but-consistent body model for tests: vertices are
        scattered around the joints of a canonical stick skeleton, skinning
        weights follow the nearest joints."""
        rs = np.random.RandomState(seed)
        # canonical joint positions: rough humanoid layout
        joints = np.zeros((NUM_JOINTS, 3), np.float32)
        for j in range(1, NUM_JOINTS):
            direction = rs.normal(size=3)
            direction /= np.linalg.norm(direction)
            joints[j] = joints[SMPL_PARENTS[j]] + 0.15 * direction
        owner = rs.randint(0, NUM_JOINTS, num_verts)
        v_template = joints[owner] + 0.05 * rs.normal(size=(num_verts, 3))
        v_template = v_template.astype(np.float32)
        # soft skinning: mostly the owner joint, a bit of its parent
        lbs = np.zeros((num_verts, NUM_JOINTS), np.float32)
        lbs[np.arange(num_verts), owner] = 0.8
        parent_owner = np.where(SMPL_PARENTS[owner] >= 0,
                                SMPL_PARENTS[owner], owner)
        lbs[np.arange(num_verts), parent_owner] += 0.2
        lbs /= lbs.sum(-1, keepdims=True)
        # J_regressor: average of the verts owned by each joint
        J_reg = np.zeros((NUM_JOINTS, num_verts), np.float32)
        for j in range(NUM_JOINTS):
            mask = owner == j
            if mask.any():
                J_reg[j, mask] = 1.0 / mask.sum()
            else:  # fall back: nearest vertex
                J_reg[j, np.argmin(np.linalg.norm(
                    v_template - joints[j], axis=1))] = 1.0
        # make the regressor exact at rest: re-derive joints from verts
        shapedirs = 0.01 * rs.normal(size=(num_verts, 3, num_betas))
        posedirs = 0.001 * rs.normal(size=(num_verts, 3, 9 * (NUM_JOINTS - 1)))
        h36m = np.zeros((17, num_verts), np.float32)
        for j in range(17):
            h36m[j] = J_reg[j % NUM_JOINTS]
        return cls(v_template=v_template,
                   shapedirs=shapedirs.astype(np.float32),
                   posedirs=posedirs.astype(np.float32),
                   J_regressor=J_reg, lbs_weights=lbs,
                   J_regressor_h36m=h36m,
                   # identity rotation in this repo's (3, 2) column-major
                   # rot6d layout: columns b1=(1,0,0), b2=(0,1,0)
                   mean_pose=np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32),
                                     NUM_JOINTS),
                   mean_shape=np.zeros(num_betas, np.float32))


def _rigid_transform(rotmats, joints, parents):
    """Forward-kinematics world transforms per joint.

    rotmats: (B, 24, 3, 3); joints: (B, 24, 3) rest positions.
    Returns (posed_joints (B,24,3), rel_transforms (B,24,4,4)).
    """
    B = rotmats.shape[0]
    rel_j = joints.at[:, 1:].add(-joints[:, parents[1:]])

    def make_T(R, t):
        T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
        T = T.at[..., :3, :3].set(R)
        T = T.at[..., :3, 3].set(t)
        return T.at[..., 3, 3].set(1.0)

    local = make_T(rotmats, rel_j)  # (B, 24, 4, 4)

    # chain composition along the tree; 24 joints -> unrolled python loop
    # compiles to straight-line code (parents are static)
    world = [local[:, 0]]
    for j in range(1, NUM_JOINTS):
        world.append(world[parents[j]] @ local[:, j])
    world = jnp.stack(world, axis=1)  # (B, 24, 4, 4)

    posed_joints = world[..., :3, 3]
    # subtract the rest-pose contribution: A' = A - pack(A @ [J, 0])
    joints_h = jnp.concatenate(
        [joints, jnp.zeros_like(joints[..., :1])], axis=-1)  # (B, 24, 4)
    shifted = jnp.einsum("bjmn,bjn->bjm", world, joints_h)   # (B, 24, 4)
    rel = world.at[..., :3, 3].add(-shifted[..., :3])
    return posed_joints, rel


def smpl_forward(model: SMPLModel, betas, pose, pose2rot: bool = True,
                 transl=None):
    """SMPL forward pass.

    betas: (B, n_betas). pose: (B, 72) axis-angle if pose2rot else
    (B, 24, 3, 3) rotation matrices. Returns dict with 'vertices'
    (B, V, 3), 'joints' (B, 24, 3), 'rotmats'.
    """
    B = betas.shape[0]
    v_template = jnp.asarray(model.v_template)
    shapedirs = jnp.asarray(model.shapedirs)
    posedirs = jnp.asarray(model.posedirs)
    J_reg = jnp.asarray(model.J_regressor)
    lbs_w = jnp.asarray(model.lbs_weights)
    parents = model.parents

    if pose2rot:
        rotmats = batch_rodrigues(pose.reshape(B, NUM_JOINTS, 3))
    else:
        rotmats = pose.reshape(B, NUM_JOINTS, 3, 3)

    # shape blendshapes
    v_shaped = v_template + jnp.einsum("bl,vcl->bvc", betas, shapedirs)
    joints = jnp.einsum("jv,bvc->bjc", J_reg, v_shaped)

    # pose blendshapes: vec(R[1:] - I)
    ident = jnp.eye(3, dtype=rotmats.dtype)
    pose_feature = (rotmats[:, 1:] - ident).reshape(B, -1)  # (B, 207)
    v_posed = v_shaped + jnp.einsum("bl,vcl->bvc", pose_feature, posedirs)

    posed_joints, rel_transforms = _rigid_transform(rotmats, joints, parents)

    # linear blend skinning
    T = jnp.einsum("vj,bjmn->bvmn", lbs_w, rel_transforms)  # (B, V, 4, 4)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], -1)
    verts = jnp.einsum("bvmn,bvn->bvm", T, v_h)[..., :3]

    if transl is not None:
        verts = verts + transl[:, None]
        posed_joints = posed_joints + transl[:, None]
    return {"vertices": verts, "joints": posed_joints, "rotmats": rotmats}


def vertices2joints(J_regressor, vertices):
    """(J, V) @ (B, V, 3) -> (B, J, 3) (smplx.lbs.vertices2joints surface)."""
    return jnp.einsum("jv,bvc->bjc", jnp.asarray(J_regressor), vertices)


def smpl_forward_np(model: SMPLModel, betas, pose, dtype=np.float64):
    """Numpy twin of smpl_forward (axis-angle pose), for host-side GT
    synthesis inside data-loader threads (no device traffic) and as an
    independent oracle for the jnp implementation. dtype=float32 halves the
    loader-side cost (GT targets are mm-scale; f32 LBS error is ~1e-3 mm);
    the f64 default stays the test oracle."""
    betas = np.asarray(betas, dtype)
    pose = np.asarray(pose, dtype).reshape(-1, NUM_JOINTS, 3)
    B = betas.shape[0]

    # rodrigues
    angle = np.linalg.norm(pose + 1e-8, axis=-1, keepdims=True)
    axis = pose / angle
    half = angle * 0.5
    quat = np.concatenate([np.cos(half), np.sin(half) * axis], -1)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., i] for i in range(4))
    R = np.stack([
        w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (w * y + x * z),
        2 * (w * z + x * y), w * w - x * x + y * y - z * z, 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (w * x + y * z), w * w - x * x - y * y + z * z,
    ], -1).reshape(B, NUM_JOINTS, 3, 3)

    # Blend shapes as plain GEMMs — np.einsum's default (no `optimize`)
    # path is loop-based, ~10x slower than BLAS on these shapes, and the
    # loader-side GT synthesis is throughput-critical (tools/bench_loader).
    V = model.v_template.shape[0]
    sd = model.shapedirs.reshape(V * 3, -1).astype(dtype, copy=False)
    pd = model.posedirs.reshape(V * 3, -1).astype(dtype, copy=False)
    jreg = model.J_regressor.astype(dtype, copy=False)
    w_lbs = model.lbs_weights.astype(dtype, copy=False)
    v_shaped = model.v_template.astype(dtype, copy=False) \
        + (betas @ sd.T).reshape(B, V, 3)
    joints = np.matmul(jreg, v_shaped)               # (B, 24, 3)
    pose_feature = (R[:, 1:] - np.eye(3, dtype=R.dtype)).reshape(B, -1)
    v_posed = v_shaped + (pose_feature @ pd.T).reshape(B, V, 3)

    parents = model.parents
    rel_j = joints.copy()
    rel_j[:, 1:] -= joints[:, parents[1:]]
    local = np.zeros((B, NUM_JOINTS, 4, 4), dtype=R.dtype)
    local[..., :3, :3] = R
    local[..., :3, 3] = rel_j
    local[..., 3, 3] = 1.0
    world = np.zeros_like(local)
    world[:, 0] = local[:, 0]
    for j in range(1, NUM_JOINTS):
        world[:, j] = world[:, parents[j]] @ local[:, j]
    posed_joints = world[..., :3, 3].copy()
    joints_h = np.concatenate([joints, np.zeros_like(joints[..., :1])], -1)
    shifted = np.einsum("bjmn,bjn->bjm", world, joints_h)
    rel = world.copy()
    rel[..., :3, 3] -= shifted[..., :3]

    # Skinning with (3, 4) transforms: one (V, J) x (B, J, 12) GEMM, then
    # rotate+translate — never materializes per-vertex 4x4 matrices (which
    # would be ~0.5 GB at production batch sizes) or homogeneous coords.
    A = np.ascontiguousarray(rel[:, :, :3, :]).reshape(B, NUM_JOINTS, 12)
    Tv = np.matmul(w_lbs, A).reshape(B, V, 3, 4)     # (B, V, 3, 4)
    verts = (Tv[..., :3] * v_posed[:, :, None, :]).sum(-1) + Tv[..., 3]
    return {"vertices": verts.astype(np.float32),
            "joints": posed_joints.astype(np.float32)}
