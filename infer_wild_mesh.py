"""In-the-wild mesh recovery CLI
(parity: /root/reference/infer_wild_mesh.py:28-39)."""

import argparse
import os


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/mesh/MB_ft_pw3d.yaml",
                        help="Path to the config file.")
    parser.add_argument("-e", "--evaluate", default="", type=str,
                        metavar="FILENAME", help="checkpoint to evaluate")
    parser.add_argument("-j", "--json_path", type=str, required=True,
                        help="alphapose detection result json path")
    parser.add_argument("-v", "--vid_path", type=str, default="",
                        help="video path")
    parser.add_argument("-o", "--out_path", type=str, required=True,
                        help="output path")
    parser.add_argument("--ref_3d_motion_path", type=str, default=None,
                        help="3D motion path (for global trajectory)")
    parser.add_argument("--pixel", action="store_true",
                        help="align with pixel coordinates")
    parser.add_argument("--focus", type=int, default=None,
                        help="target person id")
    parser.add_argument("--clip_len", type=int, default=243,
                        help="clip length for network input")
    parser.add_argument("--no_render", action="store_true")
    return parser.parse_args()


def main():
    opts = parse_args()

    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.core.checkpoint import load_checkpoint
    from motionbert_tpu.core.config import get_config
    from motionbert_tpu.infer.wild_mesh import run_wild_mesh
    from motionbert_tpu.models.smpl import SMPLModel
    from motionbert_tpu.train.mesh import build_mesh_model

    args = get_config(opts.config)
    smpl_model = SMPLModel.from_npz(
        args.get("smpl_model_path",
                 os.path.join(args.data_root, "smpl_model.npz")))
    model = build_mesh_model(args, smpl_model)

    if opts.pixel and not opts.vid_path:
        raise SystemExit("--pixel requires --vid_path (pixel-space output "
                         "needs the video resolution)")
    if opts.evaluate and (opts.evaluate.endswith(".bin")
                          or opts.evaluate.endswith(".pth")):
        # reference torch checkpoint: tolerant name+shape-matched load onto
        # the initialized tree (BN stats included where they match)
        from motionbert_tpu.core.checkpoint import (
            load_pretrained_params, load_torch_checkpoint)

        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, opts.clip_len, args.num_joints, 3)))
        converted = load_torch_checkpoint(opts.evaluate, model_key="model")
        params, matched, _ = load_pretrained_params(
            variables["params"], converted["params"])
        print("load_weight", len(matched))
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        if converted.get("batch_stats") and "batch_stats" in extra_vars:
            bs, m2, _ = load_pretrained_params(
                extra_vars["batch_stats"], converted["batch_stats"])
            extra_vars["batch_stats"] = bs
    elif opts.evaluate:
        payload = load_checkpoint(opts.evaluate)
        params = payload["params"]
        extra_vars = payload.get("extra_vars")
    else:
        print("WARNING: no checkpoint given (-e); using random init")
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, opts.clip_len, args.num_joints, 3)))
        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}

    vid_size = None
    fps_in = 30.0
    if opts.vid_path:
        from motionbert_tpu.infer import read_video_meta

        fps_in, vid_size = read_video_meta(opts.vid_path)

    verts, _ = run_wild_mesh(
        args, json_path=opts.json_path, out_path=opts.out_path, model=model,
        params=params, extra_vars=extra_vars, smpl_model=smpl_model,
        vid_size=vid_size, fps_in=fps_in, pixel=opts.pixel, focus=opts.focus,
        clip_len=opts.clip_len, ref_3d_motion_path=opts.ref_3d_motion_path,
        render=not opts.no_render)
    print("saved", os.path.join(opts.out_path, "mesh_verts.npy"),
          "shape", verts.shape)


if __name__ == "__main__":
    main()
