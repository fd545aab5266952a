"""Native clip store: build, pack, gather correctness, loader fast path."""

import os
import pickle
import subprocess

import numpy as np
import pytest

from motionbert_tpu.data.clipstore import (
    ClipStore, ClipStoreDataset3D, build_native, write_clipstore)


@pytest.fixture(scope="module")
def store_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("clipstore")
    rs = np.random.RandomState(0)
    labels = rs.normal(size=(20, 16, 17, 3)).astype(np.float32)
    inputs = rs.normal(size=(20, 16, 17, 3)).astype(np.float32)
    both = os.path.join(root, "both.mbcs")
    labels_only = os.path.join(root, "labels.mbcs")
    write_clipstore(both, labels, inputs)
    write_clipstore(labels_only, labels)
    return both, labels_only, inputs, labels


def test_native_builds():
    so = build_native()
    assert os.path.exists(so)


def test_open_info_gather(store_paths):
    both, _, inputs, labels = store_paths
    store = ClipStore(both)
    assert len(store) == 20
    assert store.shape == (16, 17, 3)
    assert store.has_input
    idx = [3, 0, 19, 7]
    gi, gl = store.gather(idx)
    np.testing.assert_array_equal(gi, inputs[idx])
    np.testing.assert_array_equal(gl, labels[idx])
    store.close()


def test_labels_only(store_paths):
    _, labels_only, _, labels = store_paths
    store = ClipStore(labels_only)
    assert not store.has_input
    gi, gl = store.gather([5, 5, 2])
    assert gi is None
    np.testing.assert_array_equal(gl, labels[[5, 5, 2]])


def test_out_of_range(store_paths):
    both, _, _, _ = store_paths
    store = ClipStore(both)
    with pytest.raises(IndexError):
        store.gather([0, 25])
    with pytest.raises(IndexError):
        store.gather([-1])


def test_open_garbage_fails(tmp_path):
    bad = os.path.join(tmp_path, "bad.mbcs")
    with open(bad, "wb") as f:
        f.write(b"not a clip store at all" * 10)
    with pytest.raises(OSError):
        ClipStore(bad)


def test_truncated_file_fails(store_paths, tmp_path):
    both, _, _, _ = store_paths
    data = open(both, "rb").read()
    trunc = os.path.join(tmp_path, "trunc.mbcs")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(OSError):
        ClipStore(trunc)


def test_dataset_and_loader_fast_path(store_paths):
    from motionbert_tpu.data.datasets import BatchLoader

    both, labels_only, inputs, labels = store_paths
    ds = ClipStoreDataset3D(both)
    x, y = ds[4]
    np.testing.assert_array_equal(x, inputs[4])
    loader = BatchLoader(ds, batch_size=5, shuffle=False)
    batches = list(loader)
    assert len(batches) == 4
    np.testing.assert_array_equal(batches[1][0], inputs[5:10])

    # synthetic mode builds 2D from labels with conf=1
    ds_syn = ClipStoreDataset3D(labels_only, synthetic=True)
    x, y = ds_syn[0]
    np.testing.assert_array_equal(x[..., :2], y[..., :2])
    np.testing.assert_array_equal(x[..., 2], 1.0)


def test_pack_tool_roundtrip(tmp_path):
    from tools.pack_clips import pack_clip_dir

    clip_dir = os.path.join(tmp_path, "clips")
    os.makedirs(clip_dir)
    rs = np.random.RandomState(1)
    clips = []
    for i in range(6):
        d = {"data_input": rs.normal(size=(8, 17, 3)).astype(np.float32),
             "data_label": rs.normal(size=(8, 17, 3)).astype(np.float32)}
        clips.append(d)
        with open(os.path.join(clip_dir, "%08d.pkl" % i), "wb") as f:
            pickle.dump(d, f)
    out = os.path.join(tmp_path, "packed.mbcs")
    pack_clip_dir(clip_dir, out)
    store = ClipStore(out)
    gi, gl = store.gather(list(range(6)))
    for i in range(6):
        np.testing.assert_array_equal(gi[i], clips[i]["data_input"])
        np.testing.assert_array_equal(gl[i], clips[i]["data_label"])


def test_clipstore_gt_2d_test_split(store_paths):
    """gt_2d on the test split substitutes GT xy with conf=1 — matching
    MotionDataset3D's test branch (the eval protocol for gt_2d configs)."""
    both, labels_only, inputs, labels = store_paths
    ds = ClipStoreDataset3D(both, gt_2d=True, data_split="test")
    x, y = ds[3]
    np.testing.assert_array_equal(x[..., :2], labels[3][..., :2])
    np.testing.assert_array_equal(x[..., 2], 1.0)
    np.testing.assert_array_equal(y, labels[3])


def test_gather_after_close_raises(store_paths):
    """gather() on a closed store must raise, not hand the native code a
    NULL handle (which would SIGSEGV the whole process)."""
    both, _, _, _ = store_paths
    store = ClipStore(both)
    store.close()
    with pytest.raises(ValueError, match="closed"):
        store.gather([0])


def test_gather_want_input_false_skips_copy(store_paths):
    """want_input=False returns inputs=None even on a store that has an
    input stream (the synthetic/gt_2d substitution fast path)."""
    both, _, inputs, labels = store_paths
    store = ClipStore(both)
    xi, yl = store.gather([1, 2], want_input=False)
    assert xi is None
    np.testing.assert_array_equal(yl[0], labels[1])
    np.testing.assert_array_equal(yl[1], labels[2])
