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
