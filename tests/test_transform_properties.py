"""Structural invariants of the eval-critical data transforms, for ANY
input (goldens pin exact reference values on fixed inputs; these pin the
contracts — index validity, monotonicity, coverage — a refactor must keep).

Reference semantics: /root/reference/lib/utils/utils_data.py:7-112.
"""

import numpy as np

from motionbert_tpu.geometry.transforms import (
    crop_scale, crop_scale_3d, resample, split_clips)

RS = np.random.RandomState(808)


def test_resample_indices_always_valid_and_right_length():
    # target_len >= 2 for the jittered path: the reference itself indexes
    # even[1] when downsampling (utils_data.py:84), so target_len=1 is out
    # of contract there (bit-faithful twin) — real callers use clip_len>=16
    for ori in (1, 3, 27, 243, 500):
        for tgt in (2, 16, 243):
            for kw in (dict(replay=True), dict(randomness=True),
                       dict(randomness=False)):
                idx = np.asarray(resample(ori, tgt,
                                          rng=np.random.RandomState(0), **kw))
                assert idx.shape == (tgt,), (ori, tgt, kw)
                assert idx.min() >= 0 and idx.max() <= ori - 1, (ori, tgt, kw)


def test_resample_jittered_upsample_is_sorted():
    idx = np.asarray(resample(10, 40, rng=np.random.RandomState(1)))
    assert (np.diff(idx.astype(np.int64)) >= 0).all()


def test_split_clips_every_clip_is_full_length_single_video():
    for n, clip, stride in ((300, 27, 9), (26, 27, 9), (27, 27, 27)):
        vids = np.zeros(n, int)
        clips = split_clips(vids, clip, stride,
                            rng=np.random.RandomState(0))
        for c in clips:
            idx = np.asarray(list(c))
            assert len(idx) == clip
            assert idx.min() >= 0 and idx.max() < n
        if n >= clip:
            # full-stride windows cover the stream head
            assert list(clips[0]) == list(range(clip))


def test_split_clips_never_crosses_video_boundaries():
    # three videos of odd lengths; a clip's indices must map to ONE video
    vids = np.concatenate([np.full(40, 0), np.full(61, 1), np.full(33, 2)])
    clips = split_clips(vids, 27, 9, rng=np.random.RandomState(0))
    assert clips  # non-degenerate
    seen = set()
    for c in clips:
        idx = np.asarray(list(c))
        owners = set(vids[idx].tolist())
        assert len(owners) == 1, owners
        seen |= owners
    # every video contributed at least one clip (tail resampling)
    assert seen == {0, 1, 2}


def test_crop_scale_output_is_normalized():
    # valid keypoints land in [-1, 1]; confidence channel preserved
    m = RS.uniform(50, 500, (8, 17, 3)).astype(np.float32)
    m[..., 2] = RS.uniform(0.1, 1.0, (8, 17))
    out = crop_scale(m, rng=np.random.RandomState(0))
    assert out[..., :2].min() >= -1.0 - 1e-6
    assert out[..., :2].max() <= 1.0 + 1e-6


def test_crop_scale_all_invalid_returns_zeros():
    # the reference returns zeros when no joint has confidence > 0
    m = np.zeros((4, 17, 3), np.float32)
    out = crop_scale(m, rng=np.random.RandomState(0))
    assert not np.any(out)


def test_crop_scale_3d_bounds_and_root_depth_anchor():
    m = RS.randn(9, 17, 3).astype(np.float32)
    out = crop_scale_3d(m, rng=np.random.RandomState(0))
    # xy normalized into the [-1, 1] box; frame-0 root depth maps to -1
    # (z is root-relative before the (x-0.5)*2 shift, utils_data.py:31-52)
    assert np.abs(out[..., :2]).max() <= 1.0 + 1e-6
    np.testing.assert_allclose(out[0, 0, 2], -1.0, atol=1e-6)
