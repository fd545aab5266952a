"""In-the-wild mesh inference (parity: /root/reference/infer_wild_mesh.py).

Chunked clips -> MeshRegressor with flip averaging in SMPL theta space
(flipped thetas re-run through the SMPL layer) -> optional global-trajectory
recovery by grid + least-squares scale fit against a reference 3D motion ->
mesh video render.

Note: the reference averages the flipped branch's kp_3d in meters against
the original in mm (infer_wild_mesh.py:131-138 scales verts but not kp_3d);
here both branches are consistently in mm.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def err(p, x, y):
    return np.linalg.norm(
        p[0] * x + np.array([p[1], p[2], p[3]]) - y, axis=-1).mean()


def solve_scale(x, y):
    """Grid + least-squares fit of scale/translation aligning x to y
    (infer_wild_mesh.py:45-56)."""
    from scipy.optimize import least_squares

    print("Estimating camera transformation.")
    best_res = 1e5
    best_scale = None
    for init_scale in range(0, 2000, 5):
        p0 = [init_scale, 0.0, 0.0, 0.0]
        est = least_squares(err, p0, args=(x.reshape(-1, 3),
                                           y.reshape(-1, 3)))
        # est["fun"] is a shape-(1,) residual array; take the scalar
        # explicitly (ndim>0 -> scalar conversion is deprecated in numpy)
        res = float(est["fun"][0])
        if res < best_res:
            best_res = res
            best_scale = est["x"][0]
    print("Pose matching error = %.2f mm." % best_res)
    return best_scale


def run_wild_mesh(args, *, json_path: str, out_path: str, model, params,
                  extra_vars, smpl_model, vid_size=None, fps_in: float = 30.0,
                  pixel: bool = False, focus: Optional[int] = None,
                  clip_len: int = 243, ref_3d_motion_path: Optional[str] = None,
                  render: bool = True):
    import jax.numpy as jnp

    from motionbert_tpu.data.dataset_wild import WildDetDataset
    from motionbert_tpu.train.mesh import make_mesh_eval_step

    os.makedirs(out_path, exist_ok=True)
    if pixel:
        wild_dataset = WildDetDataset(json_path, clip_len=clip_len,
                                      vid_size=vid_size, scale_range=None,
                                      focus=focus)
    else:
        wild_dataset = WildDetDataset(json_path, clip_len=clip_len,
                                      scale_range=[1, 1], focus=focus)

    from motionbert_tpu.infer.batching import run_batched

    eval_step = make_mesh_eval_step(model, smpl_model, flip_tta=True)
    smpl_args = smpl_model.array_pytree()
    clips = [wild_dataset[i] for i in range(len(wild_dataset))]
    outs = run_batched(clips, int(args.get("infer_batch_size", 8)),
                       lambda b: eval_step(params, extra_vars,
                                           jnp.asarray(b), smpl_args))
    verts_all = np.concatenate([o["verts"] for o in outs])
    reg3d_all = np.concatenate([o["kp_3d"] for o in outs])

    if ref_3d_motion_path:
        ref_pose = np.load(ref_3d_motion_path)
        x = ref_pose - ref_pose[:, :1]
        y = reg3d_all - reg3d_all[:, :1]
        scale = solve_scale(x, y)
        root_cam = ref_pose[:, :1] * scale
        verts_all = verts_all - reg3d_all[:, :1] + root_cam

    np.save(os.path.join(out_path, "mesh_verts.npy"), verts_all)
    if render:
        try:
            from motionbert_tpu.viz.render import render_and_save

            render_and_save(verts_all, os.path.join(out_path, "mesh.mp4"),
                            fps=fps_in, faces=smpl_model.faces)
        except Exception as e:
            print(f"WARNING: render failed ({e}); skipping video")
    return verts_all, reg3d_all
