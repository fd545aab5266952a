"""Training-infrastructure tests: partial_train freezing, resume semantics,
camera-translation fit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.models.dstformer import DSTformer
from motionbert_tpu.train.state import TrainState, freeze_except, make_adamw

CFG = dict(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32, depth=2,
           num_heads=4, mlp_ratio=2, num_joints=17, maxlen=9)


@pytest.mark.slow
def test_freeze_except_only_updates_matching():
    model = DSTformer(**CFG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 9, 17, 3)))["params"]
    tx = freeze_except(make_adamw(1e-2, 0.0), params, ["head", "pre_logits"])
    state = TrainState.create(model.apply, params, tx)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.uniform(-1, 1, (4, 9, 17, 3)), jnp.float32)
    y = jnp.asarray(rs.uniform(-1, 1, (4, 9, 17, 3)), jnp.float32)

    def loss_fn(p):
        return jnp.mean((state.apply_fn({"params": p}, x) - y) ** 2)

    grads = jax.grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads)

    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0, params,
        new_state.params)
    flat = jax.tree_util.tree_flatten_with_path(changed)[0]
    for path, did_change in flat:
        key = jax.tree_util.keystr(path)
        trainable = "head" in key or "pre_logits" in key
        assert did_change == trainable, (key, did_change)


@pytest.mark.slow
def test_pose3d_resume_continues_epochs(tmp_path):
    """Auto-resume from latest_epoch.ckpt (reference train.py:274-276)."""
    import types
    import yaml

    from motionbert_tpu.train.pose3d import train_with_config
    from tools.make_synthetic_data import make_h36m_pickle
    from tools.convert_h36m import convert_h36m

    droot = os.path.join(tmp_path, "motion3d")
    make_h36m_pickle(os.path.join(droot, "h36m_synth.pkl"))
    convert_h36m(dt_root=droot, dt_file="h36m_synth.pkl",
                 out_root=os.path.join(droot, "clips", "H36M-SYN"),
                 n_frames=16, data_stride=8)

    from motionbert_tpu.core.config import ConfigDict

    args = ConfigDict(dict(
        train_2d=False, no_eval=True, finetune=False, partial_train=None,
        epochs=1, checkpoint_frequency=1, batch_size=8, dropout=0.0,
        learning_rate=5e-4, weight_decay=0.01, lr_decay=0.5,
        maxlen=16, dim_feat=32, mlp_ratio=2, depth=1, dim_rep=32,
        num_heads=4, att_fuse=True,
        data_root=os.path.join(droot, "clips"), subset_list=["H36M-SYN"],
        dt_file="h36m_synth.pkl", dt_root=droot,
        clip_len=16, data_stride=8, rootrel=True, sample_stride=1,
        num_joints=17, no_conf=False, gt_2d=False,
        lambda_3d_velocity=20.0, lambda_scale=0.5, lambda_lv=0.0,
        lambda_lg=0.0, lambda_a=0.0, lambda_av=0.0,
        synthetic=False, flip=True, mask_ratio=0.0, mask_T_ratio=0.0,
        noise=False, attn_impl="xla"))
    ckpt = os.path.join(tmp_path, "ckpt")
    opts = types.SimpleNamespace(checkpoint=ckpt, pretrained="", resume="",
                                 evaluate="", selection="", seed=0)
    train_with_config(args, opts)

    from motionbert_tpu.core.checkpoint import load_checkpoint

    payload1 = load_checkpoint(os.path.join(ckpt, "latest_epoch.ckpt"))
    assert payload1["epoch"] == 1  # reference stores epoch+1 (train.py:49)
    lr_after_1 = payload1["lr"]
    assert abs(lr_after_1 - 5e-4 * 0.5) < 1e-9  # decayed once

    # second run: epochs=2 -> must auto-resume at epoch 1 and continue decay
    args.epochs = 2
    opts2 = types.SimpleNamespace(checkpoint=ckpt, pretrained="", resume="",
                                  evaluate="", selection="", seed=0)
    train_with_config(args, opts2)
    payload2 = load_checkpoint(os.path.join(ckpt, "latest_epoch.ckpt"))
    assert payload2["epoch"] == 2
    assert abs(payload2["lr"] - 5e-4 * 0.25) < 1e-9

    # the host PRNG stream is persisted and restored: a resumed run draws
    # the same keys an uninterrupted run would. Uninterrupted 2-epoch run:
    ckpt_b = os.path.join(tmp_path, "ckpt_b")
    opts3 = types.SimpleNamespace(checkpoint=ckpt_b, pretrained="",
                                  resume="", evaluate="", selection="",
                                  seed=0)
    train_with_config(args, opts3)
    payload_b = load_checkpoint(os.path.join(ckpt_b, "latest_epoch.ckpt"))
    np.testing.assert_array_equal(payload2["meta"]["rng"],
                                  payload_b["meta"]["rng"])


@pytest.mark.slow
def test_pretrain_then_finetune_chain(tmp_path):
    """The reference's core workflow seam, chained end to end (VERDICT r4
    #3): masked/noisy 2D->3D pretrain -> save -> finetune pose3d AND
    action FROM that backbone via the real CLI paths (reference
    train.py:260-272 strict load; lib/utils/learning.py:39-67 tolerant
    backbone-only load). Asserts (a) every backbone param actually loads
    across the seam (no silent shape-skip) and (b) the finetuned pose3d
    run beats a from-scratch run at equal finetune steps on the synthetic
    eval — the data's depth channel is a learnable function of the 2D
    pose (make_h36m_pickle learnable_z), so more optimization reliably
    means lower e1. The action side asserts (a) plus that training runs;
    its synthetic labels are arbitrary classes of smooth motions, so a
    transfer-beats-scratch margin there would be noise, not signal."""
    import types

    from motionbert_tpu.core.checkpoint import (load_checkpoint,
                                                load_pretrained_params)
    from motionbert_tpu.core.config import ConfigDict
    from motionbert_tpu.train.pose3d import train_with_config
    from tools.convert_h36m import convert_h36m
    from tools.make_synthetic_data import (make_action_pickle,
                                           make_h36m_pickle)

    droot = os.path.join(tmp_path, "motion3d")
    make_h36m_pickle(os.path.join(droot, "h36m_synth.pkl"),
                     n_frames_per_video=64, learnable_z=True)
    convert_h36m(dt_root=droot, dt_file="h36m_synth.pkl",
                 out_root=os.path.join(droot, "clips", "H36M-SYN"),
                 n_frames=16, data_stride=8)

    # maxlen shared by every stage: the temporal embed (1, maxlen, 1, C)
    # must shape-match across the seam or the tolerant loader would
    # silently skip it (exactly the failure mode this test pins)
    base = dict(
        train_2d=False, no_eval=True, finetune=False, partial_train=None,
        checkpoint_frequency=1, batch_size=8, dropout=0.0,
        learning_rate=5e-4, weight_decay=0.01, lr_decay=0.99,
        maxlen=24, dim_feat=32, mlp_ratio=2, depth=1, dim_rep=32,
        num_heads=4, att_fuse=True,
        data_root=os.path.join(droot, "clips"), subset_list=["H36M-SYN"],
        dt_file="h36m_synth.pkl", dt_root=droot,
        clip_len=16, data_stride=8, rootrel=True, sample_stride=1,
        num_joints=17, no_conf=False, gt_2d=False,
        lambda_3d_velocity=20.0, lambda_scale=0.5, lambda_lv=0.0,
        lambda_lg=0.0, lambda_a=0.0, lambda_av=0.0,
        synthetic=False, flip=False, mask_ratio=0.0, mask_T_ratio=0.0,
        noise=False, attn_impl="xla")

    def opts_for(ckpt, **kw):
        d = dict(checkpoint=ckpt, pretrained="", resume="", evaluate="",
                 selection="", seed=0)
        d.update(kw)
        return types.SimpleNamespace(**d)

    # ---- stage 1: pretrain (masked + noisy synthetic 2D from 3D) ----
    pre_ckpt = os.path.join(tmp_path, "ckpt_pretrain")
    pre_args = ConfigDict(dict(base, epochs=3, synthetic=True,
                               mask_ratio=0.05, mask_T_ratio=0.1,
                               noise=True,
                               noise_path="params/synthetic_noise.npz",
                               d2c_params_path="params/d2c_params.pkl"))
    train_with_config(pre_args, opts_for(pre_ckpt))
    pre_params = load_checkpoint(
        os.path.join(pre_ckpt, "latest_epoch.ckpt"))["params"]

    # ---- stage 2a: finetune pose3d from the saved backbone (strict) ----
    ft_args = ConfigDict(dict(base, epochs=2, finetune=True, no_eval=False))
    ft = train_with_config(
        ft_args, opts_for(os.path.join(tmp_path, "ckpt_ft"),
                          pretrained=pre_ckpt,
                          selection="latest_epoch.ckpt"))

    # ---- stage 2b: from-scratch pose3d at equal finetune steps ----
    sc_args = ConfigDict(dict(base, epochs=2, no_eval=False))
    scratch = train_with_config(
        sc_args, opts_for(os.path.join(tmp_path, "ckpt_scratch")))
    assert ft["e1"] < scratch["e1"], (
        f"finetune e1 {ft['e1']:.2f} must beat scratch {scratch['e1']:.2f}")

    # ---- stage 3: finetune action from the same backbone (tolerant) ----
    from motionbert_tpu.train.action import (build_action_model,
                                             train_with_config as train_act)

    aroot = os.path.join(tmp_path, "action")
    make_action_pickle(os.path.join(aroot, "ntu_synth.pkl"))
    act_args = ConfigDict(dict(
        finetune=True, partial_train=None, epochs=1, batch_size=4,
        lr_backbone=5e-4, lr_head=1e-3, weight_decay=0.01, lr_decay=0.99,
        model_version="class", maxlen=24, dim_feat=32, mlp_ratio=2,
        depth=1, dim_rep=32, num_heads=4, att_fuse=True, num_joints=17,
        hidden_dim=64, dropout_ratio=0.0, dataset="ntu_synth",
        data_path=os.path.join(aroot, "ntu_synth.pkl"), data_split="xsub",
        clip_len=24, action_classes=6, random_move=False,
        scale_range_train=[1, 3], scale_range_test=[2, 2],
        attn_impl="xla", checkpoint_frequency=1))

    # (a) the tolerant loader must match EVERY backbone leaf — a param-tree
    # prefix or shape drift across the seam would silently skip weights
    import jax
    import jax.numpy as jnp

    act_model = build_action_model(act_args)
    act_init = act_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 24, 17, 3)))["params"]
    loaded, matched, discarded = load_pretrained_params(
        act_init["backbone"], pre_params)
    assert discarded == [], f"silently skipped backbone params: {discarded}"
    n_backbone = len(jax.tree_util.tree_leaves(act_init["backbone"]))
    assert len(matched) == n_backbone
    # the head tree has no counterpart in the backbone checkpoint — the
    # REAL CLI path loads backbone-only (train/action.py:160-168)
    out = train_act(act_args,
                    opts_for(os.path.join(tmp_path, "ckpt_action"),
                             pretrained=pre_ckpt,
                             selection="latest_epoch.ckpt"))
    assert np.isfinite(out.get("top1", 0.0))

    # and the loaded backbone actually differs from init (weights flowed)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), act_init["backbone"],
        loaded)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-4


def test_checkpoint_mesh_elasticity(tmp_path):
    """Checkpoint save/resume across DIFFERENT device-mesh geometries
    (VERDICT r4 #4): train one step sharded DP x TP 4x2, save through the
    real CheckpointManager (which host-ifies every leaf, gathering shards),
    then resume the SAME state on an 8x1 mesh, a 2x2 mesh, and a single
    device — the trainer's own re-placement recipe (train/pose3d.py:378,
    393-397: shard_params + jnp.asarray(opt_state)). One further identical
    step must land on identical params/loss everywhere. This is the
    reference's implicit DataParallel contract — any GPU count resumes any
    checkpoint (reference train.py:273-282) — demonstrated for the sharded
    rebuild."""
    from motionbert_tpu.core.checkpoint import (CheckpointManager,
                                                load_checkpoint)
    from motionbert_tpu.parallel import make_mesh, shard_batch, shard_params
    from motionbert_tpu.train.pose3d import make_train_step
    from motionbert_tpu.train.state import make_adamw

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    model = DSTformer(**CFG)
    lambdas = dict(lambda_scale=0.5, lambda_3d_velocity=20.0, lambda_lv=0.0,
                   lambda_lg=0.0, lambda_a=0.0, lambda_av=0.0)
    step = make_train_step(model, lambdas, rootrel=True, no_conf=False,
                           use_mask=False, use_noise=False, noise_params=None)

    rs = np.random.RandomState(0)
    frames, batch = 9, 8
    gt = rs.uniform(-1, 1, (batch, frames, 17, 3)).astype(np.float32)
    inp = np.concatenate(
        [gt[..., :2], np.ones((batch, frames, 17, 1), np.float32)], -1)
    gt2 = rs.uniform(-1, 1, gt.shape).astype(np.float32)
    inp2 = np.concatenate(
        [gt2[..., :2], np.ones((batch, frames, 17, 1), np.float32)], -1)
    rng = jax.random.PRNGKey(1)

    def fresh_state(mesh):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, frames, 17, 3)))["params"]
        if mesh is not None:
            params = shard_params(params, mesh)
        return TrainState.create(model.apply, params, make_adamw(1e-4, 0.01))

    def place_batch(mesh, x, y):
        if mesh is None:
            return jnp.asarray(x), jnp.asarray(y)
        return shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)

    # --- step 1 on a 4x2 DP x TP mesh, saved via the real manager ---
    mesh_a = make_mesh(n_data=4, n_model=2)
    xb, yb = place_batch(mesh_a, inp, gt)
    state_a, _ = step(fresh_state(mesh_a), xb, yb, rng)
    assert any(not p.sharding.is_fully_replicated
               for p in jax.tree_util.tree_leaves(state_a.params)), \
        "4x2 mesh must actually TP-shard some kernels"
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"))
    mgr.save_epoch(epoch=0, lr=1e-4, params=state_a.params,
                   opt_state=state_a.opt_state)
    payload = load_checkpoint(mgr.latest_path)
    # host-ified leaves are plain full-size arrays (no shard residue)
    for leaf in jax.tree_util.tree_leaves(payload["params"]):
        assert isinstance(leaf, np.ndarray)

    # --- step 2 on the original mesh = the reference trajectory ---
    xb2, yb2 = place_batch(mesh_a, inp2, gt2)
    ref_state, ref_terms = step(state_a, xb2, yb2, rng)
    ref_params = jax.tree_util.tree_map(np.asarray, ref_state.params)
    ref_total = float(ref_terms["total"])

    # --- resume the checkpoint on three OTHER geometries ---
    for name, mesh in [("8x1", make_mesh(n_data=8, n_model=1)),
                       ("2x2", make_mesh(n_data=2, n_model=2,
                                         devices=jax.devices()[:4])),
                       ("single", None)]:
        restored = load_checkpoint(mgr.latest_path)
        params = restored["params"]
        if mesh is not None:
            params = shard_params(params, mesh)  # trainer line 378
        state = TrainState.create(model.apply, params, make_adamw(1e-4, 0.01))
        state = state.replace(opt_state=jax.tree_util.tree_map(
            jnp.asarray, restored["opt_state"]))  # trainer lines 393-397
        xb2, yb2 = place_batch(mesh, inp2, gt2)
        new_state, terms = step(state, xb2, yb2, rng)
        np.testing.assert_allclose(
            float(terms["total"]), ref_total, rtol=2e-5,
            err_msg=f"resume-on-{name}: next-step loss diverged")
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            new_state.params, ref_params)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5, \
            f"resume-on-{name}: next-step params diverged"


def test_estimate_translation_recovers_known_camera():
    from motionbert_tpu.geometry.procrustes import estimate_translation_np

    rs = np.random.RandomState(0)
    S = rs.normal(0, 0.3, (24, 3))
    t_true = np.array([0.1, -0.2, 5.0])
    f, img = 5000.0, 224.0
    P = S + t_true
    joints_2d = f * P[:, :2] / P[:, 2:3] + img / 2.0
    t_est = estimate_translation_np(S, joints_2d, np.ones(24),
                                    focal_length=f, img_size=img)
    np.testing.assert_allclose(t_est, t_true, atol=1e-6)


@pytest.mark.slow
def test_parity_gate_plumbing(tmp_path):
    """tools/parity_gate.py runs the full convert->eval->compare pipeline
    (on synthetic data; the released-checkpoint run needs egress)."""
    import types

    from motionbert_tpu.core.config import get_config
    from motionbert_tpu.train.pose3d import train_with_config
    from tools.parity_gate import run_gate

    args = get_config("configs/pose3d/MB_train_synth_smoke.yaml")
    args.epochs = 1
    args.no_eval = True
    ckpt = os.path.join(tmp_path, "ckpt")
    opts = types.SimpleNamespace(checkpoint=ckpt, pretrained="", resume="",
                                 evaluate="", selection="", seed=0)
    train_with_config(args, opts)
    ckpt_file = os.path.join(ckpt, "latest_epoch.ckpt")
    assert os.path.exists(ckpt_file)
    # published=anything, tol=inf: exercises the pipeline, not the number
    assert run_gate("configs/pose3d/MB_train_synth_smoke.yaml", ckpt_file,
                    published=0.0, tol=float("inf"))
    # and the gate actually gates: a tiny tolerance must fail
    assert not run_gate("configs/pose3d/MB_train_synth_smoke.yaml",
                        ckpt_file, published=0.0, tol=1e-9)


def test_freeze_except_scope_leaves_head_trainable():
    """With scope="backbone", partial_train patterns freeze only backbone
    params — the reference applies partial_train_layers to the backbone
    alone before wrapping it in the task model, so heads always train
    (reference train_action.py:95-97)."""
    from motionbert_tpu.models.action_heads import ActionNet
    from motionbert_tpu.train.action import make_action_train_step

    backbone = DSTformer(**CFG)
    model = ActionNet(backbone=backbone, dim_rep=32, num_classes=6,
                      dropout_ratio=0.0, version="class", hidden_dim=64)
    x0 = jnp.zeros((1, 2, 9, 17, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = variables["params"]
    tx = freeze_except(make_adamw(1e-2, 0.0), params, ["blocks_st"],
                       scope="backbone")
    state = TrainState.create(
        model.apply, params, tx,
        extra_vars={"batch_stats": variables["batch_stats"]})
    step = make_action_train_step(model)
    rs = np.random.RandomState(0)
    xb = jnp.asarray(rs.normal(size=(4, 2, 9, 17, 3)), jnp.float32)
    yb = jnp.asarray(rs.randint(0, 6, 4))
    # host copy first: the train step donates the state's param buffers
    params0 = jax.tree_util.tree_map(np.asarray, params)
    new_state, _ = step(state, xb, yb, jax.random.PRNGKey(1))

    changed = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()) > 0, params0,
        new_state.params)
    for path, did_change in jax.tree_util.tree_flatten_with_path(changed)[0]:
        key = jax.tree_util.keystr(path)
        if "backbone" in key:
            assert did_change == ("blocks_st" in key), (key, did_change)
        else:  # head params must always train
            assert did_change, key


def test_params_npz_snapshot_roundtrip(tmp_path):
    """save_params_npz/load_params_npz — the committed-artifact format the
    trained task-gate anchor ships in (tools/train_anchor.py,
    bench._load_task_gate_anchor). Nested tree, meta dict, and the f16
    downcast path must all survive the round trip."""
    from motionbert_tpu.core.checkpoint import (load_params_npz,
                                                save_params_npz)

    params = {"blocks": {"0": {"w": np.arange(6, dtype=np.float32)
                               .reshape(2, 3)},
                         "1": {"b": np.float32([0.5, -2.0])}},
              "head": {"kernel": np.ones((3, 4), np.float32)}}
    path = os.path.join(tmp_path, "anchor.npz")
    save_params_npz(path, params, meta={"best_e1_mm": 42.5, "tag": "t"})
    loaded, meta = load_params_npz(path)
    assert meta == {"best_e1_mm": 42.5, "tag": "t"}
    flat = jax.tree_util.tree_leaves(loaded)
    assert all(a.dtype == np.float32 for a in flat)
    np.testing.assert_array_equal(loaded["blocks"]["0"]["w"],
                                  params["blocks"]["0"]["w"])
    np.testing.assert_array_equal(loaded["head"]["kernel"],
                                  params["head"]["kernel"])

    # f16 snapshot (flagship anchors ship f16 to halve repo weight)
    save_params_npz(path, params, dtype=np.float16, meta={"v": 1})
    loaded16, _ = load_params_npz(path)  # default load dtype is f32
    np.testing.assert_allclose(loaded16["blocks"]["1"]["b"],
                               params["blocks"]["1"]["b"], rtol=1e-3)


def test_load_any_checkpoint_roundtrip(tmp_path):
    """Native checkpoints return the full payload; the helper is what every
    trainer's --evaluate/--resume path uses (torch .bin fallback included,
    exercised by the converter tests)."""
    from motionbert_tpu.core.checkpoint import (
        load_any_checkpoint, save_checkpoint)

    path = os.path.join(tmp_path, "latest_epoch.ckpt")
    save_checkpoint(path, epoch=7, lr=1e-4, params={"w": np.ones(3)})
    payload = load_any_checkpoint(path)
    assert payload["epoch"] == 7 and payload["lr"] == 1e-4
    np.testing.assert_array_equal(payload["params"]["w"], np.ones(3))


@pytest.mark.slow
def test_pose3d_finetune_resume_restores_epoch(tmp_path):
    """finetune + --resume must continue from the saved epoch/optimizer
    instead of silently restarting (reference train.py:295-304 restores
    them regardless of finetune)."""
    import types

    from motionbert_tpu.core.config import get_config
    from motionbert_tpu.train.pose3d import train_with_config

    args = get_config("configs/pose3d/MB_train_synth_smoke.yaml")
    args.epochs = 1
    args.no_eval = True
    ckpt = os.path.join(tmp_path, "ckpt")
    opts = types.SimpleNamespace(checkpoint=ckpt, pretrained="", resume="",
                                 evaluate="", selection="", seed=0)
    train_with_config(args, opts)
    latest = os.path.join(ckpt, "latest_epoch.ckpt")
    assert os.path.exists(latest)

    # resume the same checkpoint with finetune=true: epoch must advance to
    # 2, not restart at 1 (which would be the from-scratch finetune path)
    args2 = get_config("configs/pose3d/MB_train_synth_smoke.yaml")
    args2.epochs = 2
    args2.no_eval = True
    args2["finetune"] = True
    opts2 = types.SimpleNamespace(checkpoint=ckpt, pretrained="",
                                  resume=latest, evaluate="", selection="",
                                  seed=0)
    train_with_config(args2, opts2)
    from motionbert_tpu.core.checkpoint import load_checkpoint

    assert load_checkpoint(latest)["epoch"] == 2
