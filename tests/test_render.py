"""Visualization parity surface: ellipse renderer, comparison video,
vis_data_batch, coordinate mapping (reference lib/utils/vismo.py)."""

import os

import numpy as np
import pytest

from motionbert_tpu.viz.render import (
    bounding_box, hex2rgb, joints2image, motion2video, pixel2world_vis_motion,
    render_and_save, vis_data_batch)


def _motion2d(T=4, J=17, seed=0):
    rs = np.random.RandomState(seed)
    return rs.uniform(-0.8, 0.8, (T, J, 2)).astype(np.float32)


def test_hex2rgb():
    assert hex2rgb("#F96706#FB8D43#FDB381") == [
        [0xF9, 0x67, 0x06], [0xFB, 0x8D, 0x43], [0xFD, 0xB3, 0x81]]


def test_pixel2world_vis_motion_reference_formula():
    """(m + 1) * 256 on x/y; depth unshifted for dim=3 (vismo.py:43-53)."""
    m = np.zeros((17, 2, 5), np.float32)
    out = pixel2world_vis_motion(m, dim=2)
    np.testing.assert_allclose(out, 256.0)
    m3 = np.zeros((17, 3, 5), np.float32)
    out3 = pixel2world_vis_motion(m3, dim=3)
    np.testing.assert_allclose(out3[:, :2], 256.0)
    np.testing.assert_allclose(out3[:, 2], 0.0)


@pytest.mark.parametrize("nr_joints", [15, 17, 49])
def test_joints2image_topologies(nr_joints):
    rs = np.random.RandomState(1)
    pose = rs.uniform(100, 400, (nr_joints, 2)).astype(np.float32)
    colors = hex2rgb("#F96706#FB8D43#FDB381")
    canvas, cropped = joints2image(pose, colors, H=512, W=512)
    assert canvas.shape == (512, 512, 3) and canvas.dtype == np.uint8
    assert (canvas != 255).any()  # something was drawn
    assert cropped.shape[1] <= 512


def test_joints2image_confidence_and_modes():
    rs = np.random.RandomState(2)
    pose = rs.uniform(100, 400, (17, 3)).astype(np.float32)
    pose[:, 2] = 1.0
    pose[3, 2] = 0.0  # zero-confidence joint is skipped
    colors = hex2rgb("#F96706#FB8D43#FDB381")
    canvas, _ = joints2image(pose, colors, H=512, W=512)
    full, _ = joints2image(np.concatenate(
        [pose[:, :2], np.ones((17, 1), np.float32)], 1), colors, H=512, W=512)
    assert (canvas != full).any()  # the skipped limb changes the image
    # transparency -> RGBA; grayscale -> single channel
    rgba, _ = joints2image(pose, colors, H=256, W=256, transparency=True)
    assert rgba.shape == (256, 256, 4)
    gray, _ = joints2image(pose, colors, H=256, W=256, grayscale=True)
    assert gray.ndim == 2


def test_motion2video_with_target_comparison(tmp_path):
    """motion_tgt blends under the prediction (vismo.py:230-236)."""
    m = _motion2d(T=3)
    jm = np.transpose(np.concatenate(
        [(m + 1) * 256, np.ones((3, 17, 1), np.float32)], -1), (1, 2, 0))
    tgt = jm.copy()
    tgt[:, :2] += 30.0
    colors = hex2rgb("#F96706#FB8D43#FDB381")
    arr = motion2video(jm, str(tmp_path / "cmp.mp4"), colors,
                       motion_tgt=tgt, as_array=True)
    arr_solo = motion2video(jm, str(tmp_path / "solo.mp4"), colors,
                            as_array=True)
    assert arr.shape == arr_solo.shape == (3, 512, 512, 3)
    assert (arr != arr_solo).any()  # the target overlay is visible


def test_render_and_save_2d_ellipse(tmp_path):
    out = render_and_save(_motion2d(), str(tmp_path / "v2d.mp4"), fps=5)
    assert os.path.exists(out)


def test_render_and_save_2d_with_conf_and_tgt(tmp_path):
    m = _motion2d()
    m3 = np.concatenate([m, np.ones((*m.shape[:2], 1), np.float32)], -1)
    out = render_and_save(m3, str(tmp_path / "v2dc.mp4"), fps=5,
                          with_conf=True, motion_tgt=m)
    assert os.path.exists(out)


def test_vis_data_batch(tmp_path):
    rs = np.random.RandomState(3)
    data_input = rs.uniform(-1, 1, (3, 2, 17, 3)).astype(np.float32)
    data_label = rs.uniform(-1, 1, (3, 2, 17, 3)).astype(np.float32)
    vis_data_batch(data_input, data_label, n_render=2,
                   save_path=str(tmp_path / "batch"))
    made = os.listdir(tmp_path / "batch")
    assert any("input_0" in f for f in made)
    assert any("gt_1" in f for f in made)


def test_bounding_box():
    img = np.zeros((10, 10, 3), np.uint8)
    img[2:5, 3:7] = 1
    assert bounding_box(img) == (2, 4, 3, 6)
