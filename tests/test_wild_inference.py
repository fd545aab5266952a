"""Wild-inference path: JSON parsing, chunking, e2e CLI behavior."""

import json
import os

import numpy as np
import pytest

from motionbert_tpu.data.dataset_wild import WildDetDataset, read_input
from tools.make_synthetic_data import make_wild_json


@pytest.fixture(scope="module")
def wild_json(tmp_path_factory):
    root = tmp_path_factory.mktemp("wild")
    return make_wild_json(os.path.join(root, "alphapose.json"), n_frames=40,
                          n_people=2)


def test_read_input_crop_scale(wild_json):
    np.random.seed(0)
    motion = read_input(wild_json, vid_size=None, scale_range=[1, 1],
                        focus=None)
    # two people interleaved -> 80 entries
    assert motion.shape == (80, 17, 3)
    assert motion.min() >= -1 and motion.max() <= 1


def test_read_input_focus_filters_person(wild_json):
    np.random.seed(0)
    m0 = read_input(wild_json, vid_size=(640, 480), scale_range=None, focus=0)
    assert m0.shape == (40, 17, 3)


def test_read_input_vid_size_normalization(wild_json):
    m = read_input(wild_json, vid_size=(640, 480), scale_range=None, focus=0)
    # centered by (w,h)/2 and scaled by min(w,h)/2
    assert np.abs(m[..., :2]).max() <= (640 / 2) / (480 / 2) + 1e-6


def test_chunking(wild_json):
    ds = WildDetDataset(wild_json, clip_len=16, vid_size=(640, 480), focus=0)
    assert len(ds) == 3  # 16 + 16 + 8
    assert ds[0].shape == (16, 17, 3)
    assert ds[2].shape == (8, 17, 3)


def test_run_wild_pose_e2e(wild_json, tmp_path):
    import jax

    from motionbert_tpu.core.config import ConfigDict
    from motionbert_tpu.infer.wild_pose import run_wild_pose
    from motionbert_tpu.models.dstformer import DSTformer

    model = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32, depth=1,
                      num_heads=4, mlp_ratio=2, num_joints=17, maxlen=16)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 16, 17, 3), np.float32))["params"]
    args = ConfigDict(dict(rootrel=False, no_conf=False))
    out = run_wild_pose(args, json_path=wild_json,
                        out_path=str(tmp_path), clip_len=16, params=params,
                        model=model, render=False, focus=0,
                        vid_size=(640, 480))
    assert out.shape == (40, 17, 3)
    assert os.path.exists(os.path.join(tmp_path, "X3D.npy"))
    # frame-0 root depth anchored at 0 for the first clip
    assert abs(out[0, 0, 2]) < 1e-6


def test_render_3d_video(tmp_path):
    from motionbert_tpu.viz.render import render_and_save

    motion = np.random.RandomState(0).normal(size=(4, 17, 3)).astype(np.float32)
    out = render_and_save(motion, os.path.join(tmp_path, "vid.mp4"), fps=5)
    assert os.path.exists(out)


def test_run_batched_groups_and_orders():
    """Same-length grouping, tail padding, per-clip order preservation."""
    import jax.numpy as jnp

    from motionbert_tpu.infer.batching import run_batched

    clips = [np.full((243, 17, 3), i, np.float32) for i in range(5)]
    clips.append(np.full((60, 17, 3), 99, np.float32))  # the short tail
    calls = []

    def fn(b):
        calls.append(b.shape)
        return jnp.asarray(b) * 2.0

    out = run_batched(clips, batch_size=4, fn=fn)
    assert [o.shape for o in out] == [c.shape for c in clips]
    for o, c in zip(out, clips):
        np.testing.assert_array_equal(o, c * 2.0)
    # 5 full clips at bs=4 -> two padded (4, 243, ...) calls; tail alone
    assert calls == [(4, 243, 17, 3), (4, 243, 17, 3), (1, 60, 17, 3)]
    # outputs are writable host copies
    out[0][0, 0, 0] = -1.0
