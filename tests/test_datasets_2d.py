"""2D pretraining datasets (PoseTrack / InstaVariety) on synthetic data."""

import os

import numpy as np
import pytest

from motionbert_tpu.data.datasets import InstaVDataset2D, PoseTrackDataset2D
from tools.make_synthetic_data import make_instav_npy, make_posetrack_json


def test_posetrack_dataset(tmp_path):
    root = make_posetrack_json(os.path.join(tmp_path, "pt"), n_files=2,
                               n_tracks=3, n_frames=35)
    np.random.seed(0)
    ds = PoseTrackDataset2D(data_root=root + os.sep)
    assert len(ds) > 0
    x, y = ds[0]
    assert x.shape == (30, 17, 3)  # 30-frame clips
    np.testing.assert_array_equal(x, y)  # 2D self-supervision pairs
    assert x.min() >= -1 and x.max() <= 1
    # root confidence positive in every frame (the dataset filters for it)
    assert (x[:, 0, 2] > 0).all()


def test_posetrack_filters_short_tracks(tmp_path):
    root = make_posetrack_json(os.path.join(tmp_path, "pt"), n_files=1,
                               n_tracks=2, n_frames=20)  # < 30 frames
    np.random.seed(0)
    ds = PoseTrackDataset2D(data_root=root + os.sep)
    assert len(ds) == 0


def test_posetrack_parse_matches_reference_golden(tmp_path):
    """Our parser's full parse+filter pipeline == the reference
    PoseTrackDataset2D run on the SAME synthetic files (golden recorded by
    tools/make_goldens.golden_datasets_2d; reference
    dataset_motion_2d.py:77-121). Catches a shared misreading of the
    PoseTrack18 layout that format-self-consistency tests cannot."""
    z = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "datasets_2d.npz"))
    root = make_posetrack_json(os.path.join(tmp_path, "pt"), n_files=2,
                               n_tracks=3, n_frames=35)
    np.random.seed(0)  # golden seeded the reference's global RNG the same
    ds = PoseTrackDataset2D(data_root=root + os.sep)
    np.testing.assert_allclose(ds.motions_2d, z["posetrack_motions"],
                               atol=1e-6, rtol=1e-6)


def test_instav_parse_matches_reference_golden(tmp_path):
    """split_clips + validity filter == the reference InstaVDataset2D on
    the same synthetic npy pair (dataset_motion_2d.py:123-135)."""
    z = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "datasets_2d.npz"))
    root = make_instav_npy(os.path.join(tmp_path, "iv"))
    np.random.seed(0)
    ds = InstaVDataset2D(data_root=root, n_frames=27, data_stride=9)
    np.testing.assert_allclose(ds.motions_2d, z["instav_motions"],
                               atol=1e-6, rtol=1e-6)


def test_instav_dataset(tmp_path):
    root = make_instav_npy(os.path.join(tmp_path, "iv"))
    np.random.seed(0)
    ds = InstaVDataset2D(data_root=root, n_frames=27, data_stride=9)
    assert len(ds) > 0
    x, y = ds[0]
    assert x.shape == (27, 17, 3)
    np.testing.assert_array_equal(x, y)
    assert x.min() >= -1 and x.max() <= 1
