"""Action task: dataset golden parity, heads, SupCon loss, e2e training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.core.config import ConfigDict
from tools.make_synthetic_data import make_action_pickle

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def action_pkl(tmp_path_factory):
    root = tmp_path_factory.mktemp("action")
    path = os.path.join(root, "ntu_synth.pkl")
    make_action_pickle(path)
    return path


def test_nturgbd_matches_reference_golden(action_pkl):
    from motionbert_tpu.data.dataset_action import NTURGBD

    g = np.load(os.path.join(GOLDENS, "action_dataset.npz"))
    ds = NTURGBD(data_path=action_pkl, data_split="xsub_val", n_frames=24,
                 random_move=False, scale_range=[2, 2])
    motions = np.stack([ds[i][0] for i in range(len(ds))])
    labels = np.array([ds[i][1] for i in range(len(ds))])
    np.testing.assert_array_equal(labels, g["labels"])
    np.testing.assert_allclose(motions, g["motions"], atol=1e-6)


def test_oneshot_filter(action_pkl):
    from motionbert_tpu.data.dataset_action import (
        NTURGBD1Shot, ONESHOT_CLASSES)

    ds = NTURGBD1Shot(data_path=action_pkl, data_split="", n_frames=24,
                      random_move=False, scale_range=[1, 1],
                      check_split=False)
    # synthetic labels 0..5; oneshot classes include 0 -> filtered + relabeled
    assert 0 in ONESHOT_CLASSES
    assert all(0 <= l < 100 for l in ds.labels)


def test_mperclass_sampler():
    from motionbert_tpu.data.dataset_action import MPerClassSampler

    labels = np.repeat(np.arange(10), 8)
    s = MPerClassSampler(labels, m=2, batch_size=8, length=len(labels))
    idx = list(iter(s))
    assert len(idx) == len(s)
    for start in range(0, len(idx), 8):
        batch_labels = labels[idx[start:start + 8]]
        _, counts = np.unique(batch_labels, return_counts=True)
        assert (counts == 2).all()


def test_supcon_golden():
    from motionbert_tpu.losses.supcon import supcon_loss

    g = np.load(os.path.join(GOLDENS, "supcon.npz"))
    loss = supcon_loss(jnp.asarray(g["feats"]), jnp.asarray(g["labels"]),
                       temperature=0.1, base_temperature=0.07)
    np.testing.assert_allclose(float(loss), float(g["loss"]), rtol=1e-5)


def test_supcon_mperclass_step_semantics_golden():
    """The one-shot trainer's exact reshape semantics: an m-per-class batch
    of single-view embeddings reshaped (batch, -1, hidden) — pinned against
    the reference's SupConLoss on the same batch
    (reference train_action_1shot.py:188-196)."""
    from motionbert_tpu.losses.supcon import supcon_loss

    g = np.load(os.path.join(GOLDENS, "supcon.npz"))
    feats = jnp.asarray(g["feats_mpc"])          # (batch, hidden), L2-normed
    feat = feats.reshape(feats.shape[0], -1, feats.shape[-1])
    loss = supcon_loss(feat, labels=jnp.asarray(g["labels_mpc"]),
                       temperature=0.1, base_temperature=0.07)
    np.testing.assert_allclose(float(loss), float(g["loss_mpc"]), rtol=1e-5)


@pytest.mark.slow
def test_supcon_step_sharded_matches_single_device():
    """One-shot SupCon train step over the DP mesh == single device (the
    reference DataParallel-wraps the one-shot entry point too,
    train_action_1shot.py:98)."""
    from motionbert_tpu.models.action_heads import ActionNet
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.parallel import make_mesh, shard_batch, shard_params
    from motionbert_tpu.train.action import make_two_group_adamw
    from motionbert_tpu.train.action_1shot import make_supcon_train_step
    from motionbert_tpu.train.state import TrainState

    def build():
        backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                             depth=1, num_heads=4, mlp_ratio=2,
                             num_joints=17, maxlen=16)
        model = ActionNet(backbone=backbone, dim_rep=32, version="embed",
                          hidden_dim=64)
        x0 = jnp.zeros((1, 2, 16, 17, 3))
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        tx = make_two_group_adamw(1e-3, 1e-3, 0.01)
        return model, TrainState.create(model.apply, params, tx)

    rs = np.random.RandomState(0)
    xb = jnp.asarray(rs.normal(size=(8, 2, 16, 17, 3)), jnp.float32)
    yb = jnp.asarray(np.repeat(np.arange(4), 2))  # m-per-class labels
    rng = jax.random.PRNGKey(7)

    model, state = build()
    step = make_supcon_train_step(model, hidden_dim=64,
                                  temperature=0.1)
    single, loss_single = step(state, xb, yb, rng)

    mesh = make_mesh()
    model2, state2 = build()
    state2 = state2.replace(params=shard_params(state2.params, mesh))
    xs, ys = shard_batch((xb, yb), mesh)
    step2 = make_supcon_train_step(model2, hidden_dim=64,
                                   temperature=0.1)
    sharded, loss_sharded = step2(state2, xs, ys, rng)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        sharded.params, single.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-5


@pytest.mark.slow
def test_action_net_shapes_and_training():
    from motionbert_tpu.models.action_heads import ActionNet
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.train.action import (
        make_action_train_step, make_two_group_adamw)
    from motionbert_tpu.train.state import TrainState

    backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                         depth=1, num_heads=4, mlp_ratio=2, num_joints=17,
                         maxlen=16)
    model = ActionNet(backbone=backbone, dim_rep=32, num_classes=6,
                      dropout_ratio=0.1, version="class", hidden_dim=64)
    x = jnp.zeros((4, 2, 16, 17, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    logits = model.apply(variables, x)
    assert logits.shape == (4, 6)

    tx = make_two_group_adamw(1e-4, 1e-3, 0.01)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        extra_vars={"batch_stats": variables["batch_stats"]})
    step = make_action_train_step(model)
    rs = np.random.RandomState(0)
    xb = jnp.asarray(rs.normal(size=(8, 2, 16, 17, 3)), jnp.float32)
    yb = jnp.asarray(rs.randint(0, 6, 8))
    first = None
    for i in range(20):
        state, m = step(state, xb, yb, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first  # memorizes the batch
    # batch stats actually update
    bn_mean = state.extra_vars["batch_stats"]["head"]["bn"]["mean"]
    assert float(jnp.abs(bn_mean).sum()) > 0


def test_embed_head_normalized():
    from motionbert_tpu.models.action_heads import ActionNet
    from motionbert_tpu.models.dstformer import DSTformer

    backbone = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32,
                         depth=1, num_heads=4, mlp_ratio=2, num_joints=17,
                         maxlen=16)
    model = ActionNet(backbone=backbone, dim_rep=32, version="embed",
                      hidden_dim=64)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(3, 2, 16, 17, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               atol=1e-5)


def test_validate_1shot_perfect_anchors():
    """If test embeddings equal anchor embeddings, 1-NN accuracy is 1."""
    from motionbert_tpu.train.action_1shot import validate_1shot

    class StubModel:
        def apply(self, variables, x, deterministic=True):
            return jnp.asarray(x[:, 0, 0, 0, :2])  # deterministic embed

    feats = np.random.RandomState(0).normal(size=(10, 2, 4, 17, 3)).astype(
        np.float32)
    labels = np.arange(10)
    loader = [(feats, labels)]
    acc = validate_1shot(loader, loader, StubModel(), None)
    assert acc == 1.0


def test_supcon_no_positive_anchor_is_finite():
    """An anchor with NO positives (n_views=1, batch-unique label) must
    contribute 0, not 0/0-NaN the whole batch mean (the reference shares
    the flaw but its only caller always passes 2 views)."""
    from motionbert_tpu.losses.supcon import supcon_loss

    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.normal(size=(4, 1, 8)).astype(np.float32))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    loss = supcon_loss(feats, labels=jnp.asarray([0, 0, 1, 2]))
    assert bool(jnp.isfinite(loss))


def test_accuracy_topk_tie_break_matches_torch():
    """Tied logits must break toward LOWER class indices like torch.topk
    (np.argsort's default quicksort orders ties arbitrarily)."""
    from motionbert_tpu.core.metrics import accuracy_topk

    logits = np.zeros((8, 60), np.float32)  # all classes tied
    labels = np.arange(1, 9)  # none is class 0
    top1, top5 = accuracy_topk(logits, labels, topk=(1, 5))
    assert top1 == 0.0  # torch picks classes 0..k-1 on full ties
    assert top5 == 50.0  # labels 1..4 fall inside the tied top-5
