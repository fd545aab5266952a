"""Slice the H36M source pickle into the file-per-clip MB3D directory layout
consumed by MotionDataset3D (parity: /root/reference/tools/convert_h36m.py).

Usage: python tools/convert_h36m.py [--dt_root data/motion3d]
           [--dt_file h36m_sh_conf_cam_source_final.pkl]
           [--out_root data/motion3d/MB3D_f243s81/H36M-SH]
           [--n_frames 243] [--data_stride 81]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_h36m(dt_root, dt_file, out_root, n_frames=243, data_stride=81,
                 sample_stride=1):
    from motionbert_tpu.data.readers import DataReaderH36M

    reader = DataReaderH36M(
        n_frames=n_frames, sample_stride=sample_stride,
        data_stride_train=data_stride, data_stride_test=n_frames,
        dt_root=dt_root, dt_file=dt_file)
    train_data, test_data, train_labels, test_labels = reader.get_sliced_data()
    assert len(train_data) == len(train_labels)
    assert len(test_data) == len(test_labels)
    for split, data, labels in (("train", train_data, train_labels),
                                ("test", test_data, test_labels)):
        out_dir = os.path.join(out_root, split)
        os.makedirs(out_dir, exist_ok=True)
        for i in range(len(data)):
            with open(os.path.join(out_dir, "%08d.pkl" % i), "wb") as f:
                pickle.dump({"data_input": data[i], "data_label": labels[i]},
                            f)
    print(f"wrote {len(train_data)} train / {len(test_data)} test clips "
          f"to {out_root}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dt_root", default="data/motion3d")
    p.add_argument("--dt_file", default="h36m_sh_conf_cam_source_final.pkl")
    p.add_argument("--out_root", default="data/motion3d/MB3D_f243s81/H36M-SH")
    p.add_argument("--n_frames", type=int, default=243)
    p.add_argument("--data_stride", type=int, default=81)
    p.add_argument("--sample_stride", type=int, default=1)
    a = p.parse_args()
    convert_h36m(a.dt_root, a.dt_file, a.out_root, a.n_frames, a.data_stride,
                 a.sample_stride)
