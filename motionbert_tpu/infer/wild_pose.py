"""In-the-wild 3D pose inference (parity: /root/reference/infer_wild.py).

AlphaPose JSON -> halpe2h36m -> normalize -> chunk into clip_len windows ->
jitted flip-averaged DSTformer -> root handling -> X3D.npy (+ optional mp4
render, optional pixel-space rescale). The per-clip-length jit cache means
at most two compilations (full clips + the tail clip).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def run_wild_pose(args, *, json_path: str, out_path: str,
                  vid_size=None, fps_in: float = 30.0,
                  pixel: bool = False, focus: Optional[int] = None,
                  clip_len: int = 243, params=None, model=None,
                  render: bool = True):
    """Returns the (T, 17, 3) predicted 3D motion (and writes X3D.npy).

    args: model config (dim_feat, ...). params: flax params (pre-loaded).
    vid_size: (w, h) of the source video, or None to use crop_scale.
    """
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.data.dataset_wild import WildDetDataset
    from motionbert_tpu.train.pose3d import make_eval_step

    os.makedirs(out_path, exist_ok=True)

    if pixel:
        # keep relative scale with pixel coordinates (infer_wild.py:57-62)
        wild_dataset = WildDetDataset(json_path, clip_len=clip_len,
                                      vid_size=vid_size, scale_range=None,
                                      focus=focus)
    else:
        wild_dataset = WildDetDataset(json_path, clip_len=clip_len,
                                      vid_size=None, scale_range=[1, 1],
                                      focus=focus)

    # flip TTA gates on the config's `flip` key, like the reference
    # (infer_wild.py:73) and this repo's own H36M eval
    eval_step = make_eval_step(model, no_conf=args.get("no_conf", False),
                               flip_tta=args.get("flip", False))

    from motionbert_tpu.infer.batching import run_batched

    clips = [wild_dataset[i] for i in range(len(wild_dataset))]
    preds = run_batched(clips, int(args.get("infer_batch_size", 8)),
                        lambda b: eval_step(params, jnp.asarray(b)))
    results_all = []
    for clip, pred in zip(clips, preds):
        if args.get("rootrel", False):
            pred[:, 0, :] = 0  # zero the root joint (infer_wild.py:81-82)
        else:
            pred[0, 0, 2] = 0  # zero frame-0 root depth (infer_wild.py:83-85)
        if args.get("gt_2d", False):  # keep detector xy (infer_wild.py:86-87)
            pred[..., :2] = clip[..., :2]
        results_all.append(pred)
    results_all = np.concatenate(results_all)

    if render:
        try:
            from motionbert_tpu.viz.render import render_and_save

            render_and_save(results_all,
                            os.path.join(out_path, "X3D.mp4"),
                            keep_imgs=False, fps=fps_in)
        except Exception as e:  # rendering is best-effort (headless envs)
            print(f"WARNING: render failed ({e}); skipping video")

    if pixel:
        # restore pixel coordinates: undo the [-1,1] normalization
        # (infer_wild.py:92-95)
        results_all = results_all * (min(vid_size) / 2.0)
        results_all[:, :, :2] = results_all[:, :, :2] + np.array(vid_size) / 2.0

    np.save(os.path.join(out_path, "X3D.npy"), results_all)
    return results_all
