"""In-the-wild 3D pose inference CLI (parity: /root/reference/infer_wild.py:15-26).

Usage:
    python infer_wild.py --vid_path video.mp4 --json_path alphapose.json \
        --out_path out/ [--config ...] [--evaluate ckpt] [--pixel] \
        [--focus ID] [--clip_len 243]

--vid_path is optional: without it, normalization falls back to
confidence-aware crop_scale (like the reference's scale_range path).
"""

import argparse
import os

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/pose3d/MB_ft_h36m_global_lite.yaml",
                        help="Path to the config file.")
    parser.add_argument("-e", "--evaluate", default="", type=str,
                        metavar="FILENAME", help="checkpoint to evaluate")
    parser.add_argument("-j", "--json_path", type=str, required=True,
                        help="alphapose detection result json path")
    parser.add_argument("-v", "--vid_path", type=str, default="",
                        help="video path")
    parser.add_argument("-o", "--out_path", type=str, required=True,
                        help="output path")
    parser.add_argument("--pixel", action="store_true",
                        help="align with pixel coordinates")
    parser.add_argument("--focus", type=int, default=None,
                        help="target person id")
    parser.add_argument("--clip_len", type=int, default=243,
                        help="clip length for network input")
    parser.add_argument("--no_render", action="store_true",
                        help="skip video rendering")
    return parser.parse_args()


def main():
    opts = parse_args()

    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.core.config import get_config
    from motionbert_tpu.core.checkpoint import (
        load_checkpoint, load_torch_checkpoint)
    from motionbert_tpu.infer.wild_pose import run_wild_pose
    from motionbert_tpu.models.factory import load_backbone


    args = get_config(opts.config)
    model = load_backbone(args)
    if opts.pixel and not opts.vid_path:
        raise SystemExit("--pixel requires --vid_path (pixel-space output "
                         "needs the video resolution)")

    if opts.evaluate:
        if opts.evaluate.endswith(".bin") or opts.evaluate.endswith(".pth"):
            params = load_torch_checkpoint(opts.evaluate)["params"]
        else:
            params = load_checkpoint(opts.evaluate)["params"]
    else:
        print("WARNING: no checkpoint given (-e); using random init")
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, opts.clip_len, args.num_joints, 3)))["params"]

    vid_size = None
    fps_in = 30.0
    if opts.vid_path:
        from motionbert_tpu.infer import read_video_meta

        fps_in, vid_size = read_video_meta(opts.vid_path)

    results = run_wild_pose(
        args, json_path=opts.json_path, out_path=opts.out_path,
        vid_size=vid_size, fps_in=fps_in, pixel=opts.pixel,
        focus=opts.focus, clip_len=opts.clip_len, params=params,
        model=model, render=not opts.no_render)
    print("saved", os.path.join(opts.out_path, "X3D.npy"),
          "shape", results.shape)


if __name__ == "__main__":
    main()
