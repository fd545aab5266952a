"""Train-step integration tests: loss decreases, sharding equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from motionbert_tpu.data.augment import NoiseParams
from motionbert_tpu.models.dstformer import DSTformer
from motionbert_tpu.parallel import make_mesh, shard_batch, shard_params
from motionbert_tpu.train.pose3d import make_train_step, make_eval_step
from motionbert_tpu.train.state import TrainState, make_adamw

CFG = dict(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32, depth=2,
           num_heads=4, mlp_ratio=2, num_joints=17, maxlen=27)
LAMBDAS = dict(lambda_scale=0.5, lambda_3d_velocity=20.0, lambda_lv=0.0,
               lambda_lg=0.0, lambda_a=0.0, lambda_av=0.0)


def _setup(batch=8, frames=9):
    model = DSTformer(**CFG)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, frames, 17, 3)))["params"]
    state = TrainState.create(model.apply, params, make_adamw(1e-3, 0.01))
    rs = np.random.RandomState(0)
    gt3d = rs.uniform(-1, 1, (batch, frames, 17, 3)).astype(np.float32)
    inp2d = np.concatenate([gt3d[..., :2],
                            np.ones((batch, frames, 17, 1), np.float32)], -1)
    return model, state, jnp.asarray(inp2d), jnp.asarray(gt3d)


def test_loss_decreases():
    model, state, x, y = _setup()
    step = make_train_step(model, LAMBDAS, rootrel=True, no_conf=False,
                           use_mask=False, use_noise=False, noise_params=None)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(15):
        rng, sub = jax.random.split(rng)
        state, terms = step(state, x, y, sub)
        if first is None:
            first = float(terms["total"])
    assert float(terms["total"]) < first * 0.95
    assert int(state.step) == 15


def test_2d_branch():
    model, state, x, y2d = _setup()
    step = make_train_step(model, LAMBDAS, rootrel=True, no_conf=False,
                           use_mask=False, use_noise=False, noise_params=None)
    state, terms = step(state, x, x, jax.random.PRNGKey(2), has_3d=False)
    assert "2d_proj" in terms and np.isfinite(float(terms["total"]))


def test_noise_mask_path():
    p = NoiseParams.load("params/synthetic_noise.npz", "params/d2c_params.pkl")
    model, state, x, y = _setup()
    step = make_train_step(model, LAMBDAS, rootrel=True, no_conf=False,
                           use_mask=True, use_noise=True, noise_params=p,
                           mask_ratio=0.05, mask_T_ratio=0.1)
    state, terms = step(state, x, y, jax.random.PRNGKey(3))
    assert np.isfinite(float(terms["total"]))


def test_corruption_statistics():
    """Noise magnitudes and confidences behave like the learned model."""
    from motionbert_tpu.data.augment import add_noise

    p = NoiseParams.load("params/synthetic_noise.npz", "params/d2c_params.pkl")
    x = jnp.zeros((16, 27, 17, 2))
    out = add_noise(jax.random.PRNGKey(0), x, p)
    assert out.shape == (16, 27, 17, 3)
    conf = np.asarray(out[..., 2])
    assert (conf >= 0).all() and (conf <= 1).all()
    delta = np.asarray(out[..., :2])
    # noise is small in normalized coords but nonzero
    assert 0 < np.abs(delta).mean() < 0.1
    # confidence anti-correlates with displacement
    dis = np.linalg.norm(delta, axis=-1).ravel()
    cc = np.corrcoef(dis, conf.ravel())[0, 1]
    assert cc < -0.2


def test_lr_set_and_scale():
    _, state, _, _ = _setup()
    assert float(state.lr) == pytest.approx(1e-3)
    state = state.scale_lr(0.99)
    assert float(state.lr) == pytest.approx(0.99e-3)
    state = state.set_lr(5e-4)
    assert float(state.lr) == pytest.approx(5e-4)


def test_sharded_step_matches_single_device():
    """DP over the 8-device CPU mesh computes the same loss as 1 device."""
    model, state, x, y = _setup(batch=8)
    step = make_train_step(model, LAMBDAS, rootrel=True, no_conf=False,
                           use_mask=False, use_noise=False, noise_params=None)
    rng = jax.random.PRNGKey(4)
    _, terms_single = step(state, x, y, rng)

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    model2, state2, _, _ = _setup(batch=8)
    state2 = state2.replace(
        params=shard_params(state2.params, mesh),
        opt_state=jax.device_put(
            state2.opt_state,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    xs, ys = shard_batch((x, y), mesh)
    new_state, terms_sharded = step(state2, xs, ys, rng)
    np.testing.assert_allclose(float(terms_sharded["total"]),
                               float(terms_single["total"]), rtol=1e-5)


def test_dp_tp_step_matches_single_device():
    """4x2 (DP x TP) mesh: loss AND updated params match a single device.

    This exercises the tensor-parallel rules in parallel/mesh.py (_TP_RULES:
    column-parallel qkv/fc1, row-parallel proj/fc2) for numeric agreement,
    not just the pure-DP default mesh.
    """
    model, state, x, y = _setup(batch=8)
    step = make_train_step(model, LAMBDAS, rootrel=True, no_conf=False,
                           use_mask=False, use_noise=False, noise_params=None)
    rng = jax.random.PRNGKey(5)
    new_single, terms_single = step(state, x, y, rng)
    ref_params = jax.tree_util.tree_map(np.asarray, new_single.params)

    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    _, state2, _, _ = _setup(batch=8)
    state2 = state2.replace(
        params=shard_params(state2.params, mesh),
        opt_state=jax.device_put(
            state2.opt_state,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    # the TP rules must actually shard something at this geometry
    sharded = [p for p in jax.tree_util.tree_leaves(state2.params)
               if not p.sharding.is_fully_replicated]
    assert sharded, "TP rules sharded no params — test is vacuous"
    xs, ys = shard_batch((x, y), mesh)
    new_state, terms_sharded = step(state2, xs, ys, rng)
    np.testing.assert_allclose(float(terms_sharded["total"]),
                               float(terms_single["total"]), rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        new_state.params, ref_params)
    # tolerance: AdamW's 1/(sqrt(nu)+eps) amplifies cross-device
    # reduction-order noise; 5e-5 is 5% of a single lr=1e-3 update
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-5


@pytest.mark.slow
def test_dp_tp_matches_single_device_on_pallas_kernel_path():
    """4x2 (DP x TP) mesh equivalence THROUGH the fused pair kernels.

    slow tier (~5 min interpret-mode on the 1-vCPU dev box): the driver's
    dryrun_multichip phase 2 runs the same claim at depth 1 every round,
    so the default tier keeps coverage via that path.

    Every round-2 DP x TP artifact ran at C=64 (C % 128 != 0), i.e. the XLA
    fallback — whether pallas_call composes with a sharded model axis was
    never observed (VERDICT r2). This pins it: C=128 / heads=8 / hidden=256
    engages the fused pair path (interpret mode on CPU composes with jit
    sharding), and the sharded loss must match the single-device loss.
    XLA may resolve the opaque pallas call by gathering its operands — the
    claim under test is numeric equivalence, not per-device memory scaling.
    """
    cfg = dict(CFG, dim_feat=128, dim_rep=128, num_heads=8,
               attn_impl="pallas")
    model = DSTformer(**cfg)
    frames, batch = 9, 8

    def mk_state():  # the jitted step donates its state — build fresh ones
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, frames, 17, 3)))["params"]
        return TrainState.create(model.apply, params, make_adamw(1e-3, 0.01))

    rs = np.random.RandomState(0)
    gt3d = rs.uniform(-1, 1, (batch, frames, 17, 3)).astype(np.float32)
    x = jnp.asarray(np.concatenate(
        [gt3d[..., :2], np.ones((batch, frames, 17, 1), np.float32)], -1))
    y = jnp.asarray(gt3d)

    step = make_train_step(model, LAMBDAS, rootrel=True, no_conf=False,
                           use_mask=False, use_noise=False, noise_params=None)
    rng = jax.random.PRNGKey(6)
    _, terms_single = step(mk_state(), x, y, rng)

    mesh = make_mesh(n_data=4, n_model=2)
    state = mk_state()
    state2 = state.replace(
        params=shard_params(state.params, mesh),
        opt_state=jax.device_put(
            state.opt_state,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    sharded = [p for p in jax.tree_util.tree_leaves(state2.params)
               if not p.sharding.is_fully_replicated]
    assert sharded, "TP rules sharded no params — test is vacuous"
    xs, ys = shard_batch((x, y), mesh)
    _, terms_sharded = step(state2, xs, ys, rng)
    np.testing.assert_allclose(float(terms_sharded["total"]),
                               float(terms_single["total"]), rtol=1e-5)


def test_eval_step_flip_tta():
    model, state, x, y = _setup()
    ev = make_eval_step(model, no_conf=False, flip_tta=True)
    out = ev(state.params, x)
    assert out.shape == y.shape
    # flip TTA of a flipped input gives the flipped output (equivariance of
    # the averaging)
    from motionbert_tpu.geometry.skeleton import flip_data_jnp
    out_f = ev(state.params, flip_data_jnp(x))
    np.testing.assert_allclose(np.asarray(flip_data_jnp(out_f)),
                               np.asarray(out), atol=1e-5)


def test_padded_eval_batches_pads_tail_only():
    """The shared eval-loop helper (parallel.padded_eval_batches): tail
    batch padded to the first batch's size by repeating the last clip,
    earlier batches untouched, n reports the real count."""
    from motionbert_tpu.parallel import padded_eval_batches

    batches = [(np.arange(4 * 3).reshape(4, 3).astype(np.float32), "g0"),
               (np.arange(4 * 3, 7 * 3).reshape(3, 3).astype(np.float32),
                "g1")]
    out = list(padded_eval_batches(iter(batches)))
    assert [(n, gt) for _, gt, n in out] == [(4, "g0"), (3, "g1")]
    x0, x1 = np.asarray(out[0][0]), np.asarray(out[1][0])
    assert x0.shape == x1.shape == (4, 3)
    np.testing.assert_array_equal(x0, batches[0][0])
    np.testing.assert_array_equal(x1[:3], batches[1][0])
    np.testing.assert_array_equal(x1[3], batches[1][0][-1])  # repeated row

    # single-batch loader: its own canonical shape, never padded
    one = list(padded_eval_batches(iter(batches[1:])))
    assert np.asarray(one[0][0]).shape == (3, 3) and one[0][2] == 3
