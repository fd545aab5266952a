"""Motion rendering utilities (parity surface: /root/reference/lib/utils/vismo.py).

render_and_save dispatches on input shape:
- (T, 17, 2|3 with conf) 2D skeleton video (OpenCV drawing)
- (T, 17, 3) 3D skeleton video (matplotlib 3D)
- (T, 6890, 3) SMPL mesh video (matplotlib trisurf)

Video encoding uses imageio; if no ffmpeg backend is available the frames
are written as PNGs next to the target path (headless-safe, best effort).
"""

from __future__ import annotations

import os

import numpy as np

# H36M-17 skeleton edges (matches the limb topology, geometry.skeleton)
SKELETON_EDGES = [
    (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7), (7, 8), (8, 9),
    (9, 10), (8, 11), (11, 12), (12, 13), (8, 14), (14, 15), (15, 16),
]
LEFT_JOINTS = {4, 5, 6, 11, 12, 13}
RIGHT_JOINTS = {1, 2, 3, 14, 15, 16}


def pixel2world_vis_motion(motion, dim=3):
    """Shift normalized coords into a positive visualization box
    (same role as vismo.pixel2world_vis_motion)."""
    motion = np.asarray(motion, dtype=np.float32)
    out = motion.copy()
    out[..., :dim] = (motion[..., :dim] + 1) * 512
    return out


def _save_video(frames, save_path, fps):
    import imageio

    try:
        imageio.mimsave(save_path, frames, fps=int(round(fps)))
        return save_path
    except Exception:
        # no ffmpeg: dump frames as PNGs
        base = os.path.splitext(save_path)[0]
        os.makedirs(base, exist_ok=True)
        for i, fr in enumerate(frames):
            imageio.imwrite(os.path.join(base, f"{i:06d}.png"), fr)
        return base


def motion2video_3d(motion, save_path, fps=25, keep_imgs=False):
    """motion: (T, 17, 3) -> 3D skeleton video."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    motion = np.asarray(motion)
    T = motion.shape[0]
    lim = np.abs(motion).max() * 1.1 + 1e-6
    frames = []
    fig = plt.figure(figsize=(4, 4), dpi=100)
    for t in range(T):
        fig.clf()
        ax = fig.add_subplot(111, projection="3d")
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        ax.view_init(elev=12.0, azim=80)
        pose = motion[t]
        for a, b in SKELETON_EDGES:
            color = ("#2e79c7" if (a in LEFT_JOINTS or b in LEFT_JOINTS)
                     else "#e35a5a" if (a in RIGHT_JOINTS or b in RIGHT_JOINTS)
                     else "#444444")
            ax.plot([pose[a, 0], pose[b, 0]], [pose[a, 1], pose[b, 1]],
                    [pose[a, 2], pose[b, 2]], color=color, lw=2)
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        frames.append(buf.reshape(h, w, 4)[..., :3].copy())
    plt.close(fig)
    return _save_video(frames, save_path, fps)


def motion2video_2d(motion, save_path, fps=25):
    """motion: (T, 17, >=2) in pixel coords -> 2D skeleton video (cv2)."""
    import cv2

    motion = np.asarray(motion)
    T = motion.shape[0]
    size = int(np.nanmax(motion[..., :2]) * 1.1) + 20
    size = max(min(size, 2048), 64)
    frames = []
    for t in range(T):
        img = np.full((size, size, 3), 255, np.uint8)
        pose = motion[t]
        for a, b in SKELETON_EDGES:
            pa = tuple(np.round(pose[a, :2]).astype(int))
            pb = tuple(np.round(pose[b, :2]).astype(int))
            color = ((199, 90, 227)[::-1]
                     if (a in LEFT_JOINTS or b in LEFT_JOINTS)
                     else (90, 90, 227) if (a in RIGHT_JOINTS or
                                            b in RIGHT_JOINTS)
                     else (68, 68, 68))
            cv2.line(img, pa, pb, color, 2)
        for j in range(pose.shape[0]):
            cv2.circle(img, tuple(np.round(pose[j, :2]).astype(int)), 3,
                       (30, 30, 30), -1)
        frames.append(img[..., ::-1])
    return _save_video(frames, save_path, fps)


def motion2video_mesh(verts, save_path, fps=25, faces=None):
    """verts: (T, 6890, 3) -> mesh video via matplotlib trisurf."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    verts = np.asarray(verts)
    T = verts.shape[0]
    lim = np.abs(verts).max() * 1.1 + 1e-6
    frames = []
    fig = plt.figure(figsize=(4, 4), dpi=100)
    for t in range(T):
        fig.clf()
        ax = fig.add_subplot(111, projection="3d")
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        v = verts[t]
        if faces is not None:
            ax.plot_trisurf(v[:, 0], v[:, 1], v[:, 2], triangles=faces,
                            color="#dddddd", edgecolor="none")
        else:
            idx = np.arange(0, v.shape[0], 10)
            ax.scatter(v[idx, 0], v[idx, 1], v[idx, 2], s=0.2, c="#888888")
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        frames.append(buf.reshape(h, w, 4)[..., :3].copy())
    plt.close(fig)
    return _save_video(frames, save_path, fps)


def render_and_save(motion_input, save_path, keep_imgs=False, fps=25,
                    color="#F96706#FB8D43#FDB381", with_conf=False,
                    draw_face=False, faces=None):
    """Shape-dispatching renderer (vismo.py:17-37 surface)."""
    motion = np.asarray(motion_input)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    if motion.ndim == 3 and motion.shape[1] == 6890:
        return motion2video_mesh(motion, save_path, fps=fps, faces=faces)
    if motion.ndim == 3 and motion.shape[-1] == 3 and motion.shape[1] <= 32:
        # heuristics like the reference: 3 channels => 3D unless conf-like
        if with_conf or (np.all(motion[..., 2] >= 0)
                         and np.all(motion[..., 2] <= 1)
                         and motion[..., 2].std() < 0.5
                         and motion[..., :2].max() > 2):
            return motion2video_2d(motion[..., :2], save_path, fps=fps)
        return motion2video_3d(motion, save_path, fps=fps,
                               keep_imgs=keep_imgs)
    if motion.ndim == 3 and motion.shape[-1] == 2:
        return motion2video_2d(motion, save_path, fps=fps)
    raise ValueError(f"cannot infer render mode for shape {motion.shape}")
