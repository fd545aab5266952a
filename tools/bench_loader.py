"""Host data-pipeline throughput vs device consumption (VERDICT r1 #7).

Measures BatchLoader samples/sec for the three host-side-heavy pipelines —
NTU action (random_move + crop_scale per item), mesh (numpy SMPL
ground-truth synthesis per clip), and the pose3d pickle path — at realistic
clip shapes, and compares each against the device's training-step
consumption rate (pass --device-cps "action=25,mesh=400,pose3d=52" from a
TPU measurement, or leave defaults from BENCH artifacts).

Prints one JSON line. CPU-only; safe to run anywhere.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_loader(loader, max_batches=20, warmup=2):
    """Samples/sec through the loader; re-iterates when the (possibly tiny
    synthetic) dataset is exhausted before max_batches."""

    def batches():
        while True:
            got = False
            for b in loader:
                got = True
                yield b
            if not got:
                return

    it = batches()
    for _ in range(warmup):
        next(it)
    n = 0
    t0 = time.perf_counter()
    for _ in range(max_batches):
        batch = next(it)
        n += batch[0].shape[0] if isinstance(batch, (tuple, list)) \
            else batch.shape[0]
    dt = time.perf_counter() - t0
    return n / dt if dt > 0 else float("inf")


def bench_action(batch_size=128):
    from motionbert_tpu.data.dataset_action import NTURGBD
    from motionbert_tpu.data.datasets import BatchLoader

    # realistic clip shape without the 40GB real pickle: patch a dataset
    # instance with synthetic motions at NTU's production geometry
    ds = NTURGBD.__new__(NTURGBD)
    rs = np.random.RandomState(0)
    n = 4 * batch_size
    ds.motions = rs.uniform(0, 1, (n, 2, 243, 17, 3)).astype(np.float32)
    ds.motions[..., 2] = rs.uniform(0.1, 1, ds.motions.shape[:-1])
    ds.labels = rs.randint(0, 60, n)
    ds.random_move = True
    ds.scale_range = [1, 3]
    loader = BatchLoader(ds, batch_size, shuffle=True, drop_last=True)
    return measure_loader(loader, max_batches=8, warmup=1)


def bench_mesh(batch_size=32, clip_len=16):
    from motionbert_tpu.core.config import ConfigDict
    from motionbert_tpu.data.dataset_mesh import MotionSMPL
    from motionbert_tpu.data.datasets import BatchLoader
    from motionbert_tpu.models.smpl import SMPLModel

    args = ConfigDict(dict(
        clip_len=clip_len, sample_stride=1, data_stride=clip_len,
        data_root="data/synthetic/mesh",
        dt_file_pw3d="mesh_synth.pkl", flip=True))
    smpl = SMPLModel.from_npz("data/synthetic/mesh/smpl_model.npz")
    ds = MotionSMPL(args, "train", "pw3d", smpl)
    loader = BatchLoader(ds, min(batch_size, max(1, len(ds))),
                         shuffle=True, drop_last=False)
    cps = measure_loader(loader, max_batches=8, warmup=1)
    return cps


def bench_pose3d(batch_size=128):
    from motionbert_tpu.core.config import ConfigDict
    from motionbert_tpu.data.datasets import BatchLoader, MotionDataset3D

    args = ConfigDict(dict(
        data_root="data/synthetic/motion3d/MB3D_f16s8", dt_file="unused",
        clip_len=16, rootrel=True, synthetic=False, gt_2d=False,
        subset_list=["H36M-SYN"], flip=False))
    ds = MotionDataset3D(args, args.subset_list, "train")
    loader = BatchLoader(ds, min(batch_size, max(1, len(ds))), shuffle=True)
    return measure_loader(loader, max_batches=8, warmup=1)


DEVICE_CPS_DEFAULT = {
    # device consumption rates measured on the dev chip with the fused
    # pair-backward path (bench.py --all-tasks): pose3d 66.0 clips/s at
    # B=32; action 28.6 samples/s (2-person 243-frame clips, remat);
    # mesh 471 clips/s (B=128 shipped config, 16-frame clips, on-device
    # 6890-vertex LBS)
    "action": 28.9,
    "mesh": 471.0,
    "pose3d": 66.0,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device-cps", default="",
                   help="comma list task=clips_per_sec overriding defaults")
    opts = p.parse_args()
    device = dict(DEVICE_CPS_DEFAULT)
    if opts.device_cps:
        for kv in opts.device_cps.split(","):
            k, v = kv.split("=")
            device[k] = float(v)

    out = {}
    for name, fn in (("action", bench_action), ("mesh", bench_mesh),
                     ("pose3d", bench_pose3d)):
        try:
            cps = fn()
            out[name] = {
                "loader_samples_per_sec": round(cps, 1),
                "device_samples_per_sec": device[name],
                "headroom": round(cps / device[name], 2),
            }
        except Exception as e:  # missing synthetic data etc.
            out[name] = {"error": repr(e)[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
