"""JAX SMPL layer invariants, mesh head, mesh loss, and e2e mesh training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.models.smpl import (
    SMPLModel, smpl_forward, smpl_forward_np, NUM_JOINTS)

MODEL = SMPLModel.synthetic(num_verts=96, seed=3)


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_rest_pose_is_template():
    betas = jnp.zeros((1, MODEL.num_betas))
    pose = jnp.zeros((1, 72))
    out = smpl_forward(MODEL, betas, pose)
    np.testing.assert_allclose(np.asarray(out["vertices"][0]),
                               MODEL.v_template, atol=1e-5)
    rest_joints = MODEL.J_regressor @ MODEL.v_template
    np.testing.assert_allclose(np.asarray(out["joints"][0]), rest_joints,
                               atol=1e-5)


def test_global_rotation_is_rigid():
    """Rotating only the root rotates the whole rest mesh about the root."""
    angle = 0.7
    R = _rotmat([0, 0, 1], angle)
    pose = np.zeros((1, 72), np.float32)
    pose[0, :3] = angle * np.array([0, 0, 1])
    betas = jnp.zeros((1, MODEL.num_betas))
    out = smpl_forward(MODEL, betas, jnp.asarray(pose))
    root = (MODEL.J_regressor @ MODEL.v_template)[0]
    expect = (MODEL.v_template - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(out["vertices"][0]), expect,
                               atol=1e-4)


def test_shape_blendshapes_linear():
    betas = np.zeros((1, MODEL.num_betas), np.float32)
    betas[0, 2] = 1.5
    out = smpl_forward(MODEL, jnp.asarray(betas), jnp.zeros((1, 72)))
    expect = MODEL.v_template + 1.5 * MODEL.shapedirs[:, :, 2]
    np.testing.assert_allclose(np.asarray(out["vertices"][0]), expect,
                               atol=1e-5)


def test_np_twin_matches_jnp():
    rs = np.random.RandomState(0)
    betas = rs.normal(0, 1, (3, MODEL.num_betas)).astype(np.float32)
    pose = rs.normal(0, 0.4, (3, 72)).astype(np.float32)
    out_j = smpl_forward(MODEL, jnp.asarray(betas), jnp.asarray(pose))
    out_n = smpl_forward_np(MODEL, betas, pose)
    np.testing.assert_allclose(np.asarray(out_j["vertices"]),
                               out_n["vertices"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["joints"]),
                               out_n["joints"], atol=1e-4)


def test_rotmat_input_matches_axis_angle():
    from motionbert_tpu.geometry.rotations import batch_rodrigues

    rs = np.random.RandomState(1)
    betas = jnp.zeros((2, MODEL.num_betas))
    pose = rs.normal(0, 0.4, (2, 72)).astype(np.float32)
    rotmats = batch_rodrigues(jnp.asarray(pose).reshape(2, 24, 3))
    out_aa = smpl_forward(MODEL, betas, jnp.asarray(pose), pose2rot=True)
    out_rm = smpl_forward(MODEL, betas, rotmats, pose2rot=False)
    np.testing.assert_allclose(np.asarray(out_aa["vertices"]),
                               np.asarray(out_rm["vertices"]), atol=1e-5)


def test_npz_roundtrip(tmp_path):
    from tools.convert_smpl import make_synthetic_npz

    path = os.path.join(tmp_path, "m.npz")
    make_synthetic_npz(path, num_verts=96, seed=3)
    m2 = SMPLModel.from_npz(path)
    np.testing.assert_allclose(m2.v_template, MODEL.v_template)
    np.testing.assert_allclose(m2.lbs_weights, MODEL.lbs_weights)


def test_mesh_head_shapes():
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.mesh_head import MeshRegressor

    backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                         depth=1, num_heads=4, mlp_ratio=2, num_joints=17,
                         maxlen=8)
    model = MeshRegressor(backbone=backbone, smpl_model=MODEL, dim_rep=32,
                          hidden_dim=64, dropout_ratio=0.1)
    x = jnp.zeros((2, 8, 17, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["theta"].shape == (2, 8, 72 + MODEL.num_betas)
    assert out["verts"].shape == (2, 8, MODEL.num_verts, 3)
    assert out["kp_3d"].shape == (2, 8, 17, 3)
    # kp_3d comes from the h36m regressor over mm-scaled verts
    kp = np.einsum("jv,btvc->btjc", MODEL.J_regressor_h36m,
                   np.asarray(out["verts"]))
    np.testing.assert_allclose(np.asarray(out["kp_3d"]), kp, atol=1e-3)


@pytest.mark.slow
def test_mesh_loss_and_train_step():
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.mesh_head import MeshRegressor
    from motionbert_tpu.train.action import make_two_group_adamw
    from motionbert_tpu.train.mesh import make_mesh_train_step
    from motionbert_tpu.train.state import TrainState

    backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                         depth=1, num_heads=4, mlp_ratio=2, num_joints=17,
                         maxlen=8)
    model = MeshRegressor(backbone=backbone, smpl_model=MODEL, dim_rep=32,
                          hidden_dim=64, dropout_ratio=0.1)
    x = jnp.zeros((2, 8, 17, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = make_two_group_adamw(1e-3, 1e-3, 0.01)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        extra_vars={"batch_stats": variables["batch_stats"]})

    rs = np.random.RandomState(0)
    xb = jnp.asarray(rs.uniform(-1, 1, (2, 8, 17, 3)), jnp.float32)
    gt_pose = rs.normal(0, 0.3, (2, 8, 72)).astype(np.float32)
    gt_shape = rs.normal(0, 1, (2, 8, MODEL.num_betas)).astype(np.float32)
    out_np = smpl_forward_np(MODEL, gt_shape.reshape(-1, MODEL.num_betas),
                             gt_pose.reshape(-1, 72))
    verts = out_np["vertices"].reshape(2, 8, -1, 3) * 1000.0
    kp = np.einsum("jv,btvc->btjc", MODEL.J_regressor_h36m, verts)
    gt = {
        "theta": jnp.asarray(np.concatenate([gt_pose, gt_shape], -1)),
        "kp_3d": jnp.asarray(kp - kp[:, :, :1]),
        "verts": jnp.asarray(verts - kp[:, :, :1]),
    }
    # all 10 keys are required (missing lambdas fail loudly, like the
    # reference's args.lambda_* attribute reads)
    lambdas = dict(lambda_3d=0.5, lambda_scale=0, lambda_3dv=10,
                   lambda_lv=0, lambda_lg=0, lambda_a=0, lambda_av=0,
                   lambda_pose=1000, lambda_shape=1, lambda_norm=20)
    step = make_mesh_train_step(model, lambdas, "L1")
    smpl_args = MODEL.array_pytree()
    first = None
    for i in range(10):
        state, terms = step(state, xb, gt, jax.random.PRNGKey(i), smpl_args)
        if first is None:
            first = float(terms["total"])
    assert float(terms["total"]) < first
    assert np.isfinite(float(terms["mpjpe"]))


def test_evaluate_mesh_calibration():
    from motionbert_tpu.losses.mesh import evaluate_mesh

    rs = np.random.RandomState(0)
    kp = rs.normal(0, 100, (4, 17, 3))
    verts = rs.normal(0, 100, (4, 50, 3))
    results = {"kp_3d": kp.copy(), "verts": verts.copy(),
               "kp_3d_gt": kp.copy(), "verts_gt": verts.copy()}
    err = evaluate_mesh(results)
    for k, v in err.items():
        assert v < 1e-6, (k, v)
    # constant z offset on all joints/verts is removed by root-relativity
    results2 = {"kp_3d": kp + [0, 0, 50.0], "verts": verts + [0, 0, 50.0],
                "kp_3d_gt": kp, "verts_gt": verts}
    err2 = evaluate_mesh(results2)
    assert err2["mpjpe"] < 1e-6 and err2["mpve"] < 1e-6


def test_evaluate_mesh_golden():
    """Golden parity vs the reference evaluate_mesh / compute_error(_frames)
    (utils_mesh.py:357-438) on f16-pinned random pred/GT batches at the
    real 6890-vertex topology: pins the h36m_17_to_14 subset, root-relative
    conventions, and the rigid_align Procrustes path end to end."""
    import os

    from motionbert_tpu.losses.mesh import (compute_error,
                                            compute_error_frames,
                                            evaluate_mesh)

    z = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "mesh_eval.npz"))
    results = {k: z[k].astype(np.float32)
               for k in ("verts", "verts_gt", "kp_3d", "kp_3d_gt")}
    err = evaluate_mesh(results)
    for k in ("mpve", "mpjpe", "pa_mpjpe", "mpjpe_17j", "pa_mpjpe_17j"):
        np.testing.assert_allclose(err[k], float(z[f"em_{k}"]), rtol=1e-5), k
    # the PA metrics must actually exercise the alignment (the golden's
    # pred is a similarity transform of GT + small noise)
    assert err["pa_mpjpe"] < 0.1 * err["mpjpe"]

    smpl_out = {"verts": results["verts"], "kp_3d": results["kp_3d"]}
    gt = {"verts": results["verts_gt"], "kp_3d": results["kp_3d_gt"]}
    mpjpe, mpve = compute_error(smpl_out, gt)
    np.testing.assert_allclose(mpjpe, float(z["ce_mpjpe"]), rtol=1e-5)
    np.testing.assert_allclose(mpve, float(z["ce_mpve"]), rtol=1e-5)
    mpjpes, mpves = compute_error_frames(smpl_out, gt)
    np.testing.assert_allclose(mpjpes, z["cef_mpjpes"], rtol=1e-5)
    np.testing.assert_allclose(mpves, z["cef_mpves"], rtol=1e-5)


def test_flip_tta_eval_step():
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.mesh_head import MeshRegressor
    from motionbert_tpu.train.mesh import make_mesh_eval_step

    backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                         depth=1, num_heads=4, mlp_ratio=2, num_joints=17,
                         maxlen=8)
    model = MeshRegressor(backbone=backbone, smpl_model=MODEL, dim_rep=32,
                          hidden_dim=64, dropout_ratio=0.1)
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (2, 8, 17, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ev = make_mesh_eval_step(model, MODEL, flip_tta=True)
    out = ev(variables["params"],
             {"batch_stats": variables["batch_stats"]}, x,
             MODEL.array_pytree())
    assert out["verts"].shape == (2, 8, MODEL.num_verts, 3)
    assert bool(jnp.isfinite(out["verts"]).all())


def test_motion_smpl_get_batch_matches_getitem():
    """The vectorized batch gather equals the per-item path (including the
    flip rng stream, drawn in index order)."""
    from motionbert_tpu.core.config import ConfigDict
    from motionbert_tpu.data.dataset_mesh import MotionSMPL

    args = ConfigDict(dict(
        clip_len=16, sample_stride=1, data_stride=16,
        data_root="data/synthetic/mesh", dt_file_pw3d="mesh_synth.pkl",
        flip=True))
    ds_item = MotionSMPL(args, "train", "pw3d", MODEL)
    ds_batch = MotionSMPL(args, "train", "pw3d", MODEL)
    idx = list(range(min(4, len(ds_item))))
    per_item = [ds_item[i] for i in idx]  # consumes rng in index order
    bx, bgt = ds_batch.get_batch(idx)
    for i in idx:
        np.testing.assert_allclose(bx[i], per_item[i][0], atol=1e-6)
        for k in ("theta", "kp_3d", "verts"):
            # both paths run the same f32 LBS; only the batched-vs-per-clip
            # BLAS reduction order differs
            np.testing.assert_allclose(bgt[k][i], per_item[i][1][k],
                                       atol=1e-4)


@pytest.mark.slow
def test_mesh_trainer_eval_only_pw3d(tmp_path):
    """train_pw3d: false with dt_file_pw3d set — the reference-supported
    recipe of training on other sets while VALIDATING pw3d every epoch
    (reference train_mesh.py:368-371). The pw3d loader pair is then
    (None, test); the epoch loop must skip set_epoch/run_train on the
    None train loader and still run the pw3d validation."""
    import types

    from motionbert_tpu.core.config import get_config
    from motionbert_tpu.train.mesh import train_with_config

    args = get_config("configs/mesh/MB_train_synth_smoke.yaml")
    args["train_pw3d"] = False
    args["epochs"] = 1
    args["checkpoint_frequency"] = 1
    opts = types.SimpleNamespace(checkpoint=str(tmp_path), pretrained="",
                                 resume="", evaluate="", selection="",
                                 seed=0)
    out = train_with_config(args, opts)
    # pw3d validation RAN and produced a real metric: best_jpe must have
    # moved off its 9999.0 initializer (a skipped validation or a NaN
    # mpjpe both leave it at 9999.0 — NaN < 9999 is False)
    assert out["best_jpe"] < 9999.0
    assert os.path.exists(os.path.join(str(tmp_path), "latest_epoch.ckpt"))


def test_mesh_apply_embeds_no_smpl_constants():
    """With smpl=SMPLModel.array_pytree() passed as a jit argument, the
    traced mesh forward must embed NO body-model-sized constants — at the
    real 6890-vert topology closed-over SMPL tensors are ~19 MB of
    serialized executable that the remote compile service re-uploads per
    program (CLAUDE.md)."""
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.mesh_head import MeshRegressor

    backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                         depth=1, num_heads=4, mlp_ratio=2, num_joints=17,
                         maxlen=8)
    model = MeshRegressor(backbone=backbone, smpl_model=MODEL, dim_rep=32,
                          hidden_dim=64, dropout_ratio=0.0)
    x = jnp.zeros((2, 8, 17, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    smpl_args = MODEL.array_pytree()

    def fwd(p, xx, s):
        return model.apply({"params": p, "batch_stats": v["batch_stats"]},
                           xx, deterministic=True, smpl=s)

    closed = jax.make_jaxpr(fwd)(v["params"], x, smpl_args)
    # NO SMPL tensor may appear among the trace constants — not just
    # posedirs: shapedirs/J_regressor/lbs_weights are still multi-MB at
    # the real 6890-vert topology. Tiny leaves (<128 elems, e.g. the
    # 10-beta mean_shape) are excluded: a small glue const could collide
    # by size, and their upload cost is negligible anyway.
    leaf_sizes = {int(np.asarray(a).size) for a in smpl_args.values()
                  if np.asarray(a).size >= 128}
    const_sizes = {int(np.prod(c.shape)) for c in closed.consts
                   if getattr(c, "shape", None)}
    assert not (leaf_sizes & const_sizes), (leaf_sizes, const_sizes)

    # and the arrays DO flow in as arguments: outputs respond to them
    out = fwd(v["params"], x, smpl_args)
    shifted = dict(smpl_args, v_template=smpl_args["v_template"] + 0.1)
    out2 = fwd(v["params"], x, shifted)
    assert float(jnp.abs(out2["verts"] - out["verts"]).max()) > 0
