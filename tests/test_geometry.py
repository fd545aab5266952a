"""Golden-vector parity tests for geometry utilities vs the reference."""

import os

import numpy as np
import pytest

from motionbert_tpu.geometry import (
    crop_scale, crop_scale_3d, flip_data, resample, split_clips, make_cam,
    coco2h36m, halpe2h36m, posetrack2h36m,
)
from motionbert_tpu.geometry.transforms import human_tracking

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "geometry.npz"))


def test_crop_scale_golden(g):
    np.random.seed(11)
    out = crop_scale(g["crop_scale_in"], [1, 1])
    np.testing.assert_allclose(out, g["crop_scale_out"], atol=1e-6)


def test_crop_scale_random_ratio_golden(g):
    np.random.seed(int(g["crop_scale_r_seed"]))
    out = crop_scale(g["crop_scale_in"], [0.5, 2.0])
    np.testing.assert_allclose(out, g["crop_scale_r_out"], atol=1e-6)


def test_crop_scale_degenerate():
    motion = np.zeros((4, 17, 3))
    assert crop_scale(motion).sum() == 0


def test_crop_scale_3d_golden(g):
    np.random.seed(13)
    out = crop_scale_3d(g["crop_scale_3d_in"], [1, 1])
    np.testing.assert_allclose(out, g["crop_scale_3d_out"], atol=1e-6)


def test_flip_golden(g):
    np.testing.assert_allclose(flip_data(g["flip_in"]), g["flip_out"], atol=0)


def test_flip_involution(g):
    x = g["flip_in"]
    np.testing.assert_allclose(flip_data(flip_data(x)), x, atol=0)


def test_flip_jnp_matches_numpy(g):
    from motionbert_tpu.geometry import flip_data_jnp

    x = g["flip_in"]
    np.testing.assert_allclose(np.asarray(flip_data_jnp(x)), flip_data(x),
                               atol=1e-7)


def test_resample_deterministic_golden(g):
    np.testing.assert_array_equal(resample(100, 32, randomness=False),
                                  g["resample_down"])
    np.testing.assert_array_equal(resample(10, 32, randomness=False),
                                  g["resample_up"])


def test_resample_replay_golden(g):
    np.random.seed(14)
    np.testing.assert_array_equal(resample(10, 32, replay=True),
                                  g["resample_replay_up"])


def test_resample_random_bounds():
    idx = resample(50, 243, randomness=True)
    assert idx.min() >= 0 and idx.max() <= 49
    assert (np.diff(idx.astype(np.int64)) >= 0).all()


def test_split_clips_golden(g):
    np.random.seed(int(g["split_seed"]))
    clips = split_clips(list(g["split_vid_list"]), int(g["split_n"]),
                        int(g["split_stride"]))
    got = np.stack([np.asarray(list(c)) for c in clips])
    np.testing.assert_array_equal(got, g["split_clips_out"])


def test_split_clips_test_protocol_deterministic():
    # test stride == clip_len on video lengths that are exact multiples:
    # pure range windows, no randomness (the H36M eval protocol case).
    vid = np.repeat([0, 1], 32)
    clips = split_clips(vid, 16, 16)
    assert len(clips) == 4
    for i, c in enumerate(clips):
        np.testing.assert_array_equal(np.asarray(list(c)),
                                      np.arange(i * 16, (i + 1) * 16))


def test_remaps_golden(g):
    np.testing.assert_allclose(coco2h36m(g["coco_in"]), g["coco_out"], atol=1e-12)
    np.testing.assert_allclose(halpe2h36m(g["halpe_in"]), g["halpe_out"], atol=1e-12)
    np.testing.assert_allclose(posetrack2h36m(g["posetrack_in"]),
                               g["posetrack_out"], atol=1e-12)


def test_make_cam_golden(g):
    out = make_cam(g["make_cam_in"], tuple(g["make_cam_shape"]))
    np.testing.assert_allclose(out, g["make_cam_out"], atol=1e-12)


def test_human_tracking_golden(g):
    np.testing.assert_allclose(human_tracking(g["track_in"]), g["track_out"],
                               atol=1e-12)


def test_human_tracking_single_person():
    x = np.random.RandomState(0).normal(size=(1, 5, 17, 2))
    np.testing.assert_array_equal(human_tracking(x), x)
