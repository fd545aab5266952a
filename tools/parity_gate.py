"""Released-checkpoint parity gate: assert H36M MPJPE within tolerance of
the reference's published number.

The north-star acceptance check (SURVEY.md §6): load a released MotionBERT
torch checkpoint through the converter, run the full H36M eval protocol,
and require |MPJPE - published| <= tol. The checkpoints live on OneDrive
and this build environment has zero egress, so the gate runs wherever the
artifacts exist:

    python tools/parity_gate.py \
        --config configs/pose3d/MB_train_h36m.yaml \
        --checkpoint /path/to/best_epoch.bin \
        --published 39.2 --tol 1.0

Published numbers (reference README.md:76-84): scratch pose3d 39.2 mm
(MB_train_h36m), finetuned 37.2 mm (MB_ft_h36m).

Exit code 0 = pass; prints one JSON line either way.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_gate(config, checkpoint, published, tol):
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from motionbert_tpu.core.checkpoint import (
        load_checkpoint, load_torch_checkpoint)
    from motionbert_tpu.core.config import get_config
    from motionbert_tpu.data.datasets import BatchLoader, MotionDataset3D
    from motionbert_tpu.data.readers import DataReaderH36M
    from motionbert_tpu.models.factory import default_attn_impl, \
        load_backbone
    from motionbert_tpu.parallel import make_mesh, shard_params
    from motionbert_tpu.train.pose3d import evaluate

    args = get_config(config)
    if checkpoint.endswith(".bin") or checkpoint.endswith(".pth"):
        params = load_torch_checkpoint(checkpoint)["params"]
    else:
        params = load_checkpoint(checkpoint)["params"]

    # the <=1mm gate is a PRECISION check: force fp32 compute (the factory
    # defaults to bf16 on TPU for training/serving throughput)
    model = load_backbone(args, compute_dtype=jnp.float32,
                          attn_impl=args.get("attn_impl",
                                             default_attn_impl()))
    test_dataset = MotionDataset3D(args, args.subset_list, "test")
    test_loader = BatchLoader(test_dataset, args.batch_size, shuffle=False)
    datareader = DataReaderH36M(
        n_frames=args.clip_len, sample_stride=args.sample_stride,
        data_stride_train=args.data_stride, data_stride_test=args.clip_len,
        dt_root=args.get("dt_root", "data/motion3d"), dt_file=args.dt_file)

    mesh = make_mesh()
    params = shard_params(params, mesh)
    e1, e2, _ = evaluate(args, model, params, test_loader, datareader,
                         mesh=mesh)
    delta = abs(e1 - published)
    result = {
        "mpjpe_mm": round(e1, 3),
        "p_mpjpe_mm": round(e2, 3),
        "published_mm": published,
        "delta_mm": round(delta, 3),
        "tol_mm": tol,
        "parity": "pass" if delta <= tol else "FAIL",
    }
    print(json.dumps(result))
    return delta <= tol


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="released torch .bin/.pth or a native .ckpt")
    p.add_argument("--published", type=float, default=39.2,
                   help="reference's published MPJPE in mm (README.md:78)")
    p.add_argument("--tol", type=float, default=1.0)
    opts = p.parse_args()
    if not os.path.exists(opts.checkpoint):
        print(json.dumps({"parity": "skip",
                          "reason": f"checkpoint not found: {opts.checkpoint}"}))
        sys.exit(2)
    sys.exit(0 if run_gate(opts.config, opts.checkpoint, opts.published,
                           opts.tol) else 1)


if __name__ == "__main__":
    main()
