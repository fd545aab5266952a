"""Motion rendering utilities (parity surface: /root/reference/lib/utils/vismo.py).

render_and_save dispatches like the reference (vismo.py:17-37):
- (T, J, 2), or (T, J, 3) with with_conf=True -> 2D skeleton video drawn
  with the ellipse-limb renderer (joints2image), normalized coords mapped
  to pixels by pixel2world_vis_motion.
- (T, 6890, 3) -> SMPL mesh video (matplotlib trisurf).
- (T, J, 3) -> 3D skeleton video (matplotlib 3D).

joints2image reproduces vismo.py:89-213: 17/15/49-joint limb topologies,
per-side L/M/R coloring, confidence-weighted joint/limb skipping,
anti-aliased ellipse limbs alpha-blended onto the canvas (0.4/0.6), optional
transparency (RGBA) and grayscale output, and the column bounding-box crop.
motion2video (vismo.py:213-244) adds the motion_tgt comparison overlay
(target blended at 0.3 under the prediction at 0.7).

Video encoding uses imageio; if no ffmpeg backend is available the frames
are written as PNGs next to the target path (headless-safe, best effort).
"""

from __future__ import annotations

import math
import os

import numpy as np

# H36M-17 skeleton edges (matches the limb topology, geometry.skeleton)
SKELETON_EDGES = [
    (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7), (7, 8), (8, 9),
    (9, 10), (8, 11), (11, 12), (12, 13), (8, 14), (14, 15), (15, 16),
]
LEFT_JOINTS = {4, 5, 6, 11, 12, 13}
RIGHT_JOINTS = {1, 2, 3, 14, 15, 16}


def hex2rgb(hex_str: str, number_of_colors: int = 3):
    """Split a concatenated hex string into RGB triples (vismo.py:77-86)."""
    h = hex_str
    rgb = []
    for _ in range(number_of_colors):
        h = h.lstrip("#")
        rgb.append([int(h[i:i + 2], 16) for i in (0, 2, 4)])
        h = h[6:]
    return rgb


def rgb2rgba(color):
    return (color[0], color[1], color[2], 255)


def bounding_box(img):
    """(min_row, max_row, min_col, max_col) of nonzero pixels
    (vismo.py:344-347)."""
    a = np.where(img != 0)
    if a[0].size == 0:
        # all-zero canvas (e.g. a transparency render of a frame whose
        # joints all have zero confidence): an empty box, not a crash of
        # the whole video job on np.min over an empty selection
        return 0, 0, 0, 0
    return np.min(a[0]), np.max(a[0]), np.min(a[1]), np.max(a[1])


def pixel2world_vis(pose):
    """(J, 2) normalized [-1,1] -> pixels in a 512-box (vismo.py:39-41)."""
    return (np.asarray(pose, np.float32) + [1, 1]) * 512 / 2


def pixel2world_vis_motion(motion, dim=2):
    """(J, dim, T) normalized -> pixel coords; depth is left unshifted for
    dim=3 (vismo.py:43-53)."""
    motion = np.asarray(motion, np.float32)
    offset = np.ones((dim, motion.shape[-1]), np.float32)
    if dim == 3:
        offset[2] = 0
    return (motion + offset) * 512 / 2


# Limb topology + L/M/R color assignment per joint count (vismo.py:93-146).
# 49 = basic(15) + eyes(2, not drawn) + toes(2) + hands(30); 17 = H36M.
def _topology(nr_joints):
    if nr_joints == 49:
        limbs = [[0, 1], [1, 2], [1, 5], [1, 8], [2, 3], [3, 4], [5, 6],
                 [6, 7], [8, 9], [8, 13], [9, 10], [10, 11], [11, 12],
                 [13, 14], [14, 15], [15, 16]]
        joints_lmr = "MMLLLRRRMLLLLRRRRRL" + "L" * 15 + "R" * 15
        limbs_lmr = "MLRMLLRRLRLLLRRRRR"[:len(limbs)]
    elif nr_joints == 15:
        limbs = [[0, 1], [1, 2], [1, 5], [1, 8], [2, 3], [3, 4], [5, 6],
                 [6, 7], [8, 9], [8, 12], [9, 10], [10, 11], [12, 13],
                 [13, 14]]
        joints_lmr = "MMLLLRRRMLLLRRR"
        limbs_lmr = "MLRMLLRRLRLLRR"
    elif nr_joints == 17:
        limbs = [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7],
                 [7, 8], [8, 9], [8, 11], [8, 14], [9, 10], [11, 12],
                 [12, 13], [14, 15], [15, 16]]
        joints_lmr = "MRRRLLLMMMMLLLRRR"
        limbs_lmr = "RRRLLLMMMLRMLLRR"
    else:
        raise ValueError("Only support number of joints be 49 or 17 or 15")
    return limbs, joints_lmr, limbs_lmr


def joints2image(joints_position, colors, transparency=False, H=1000,
                 W=1000, nr_joints=None, imtype=np.uint8, grayscale=False,
                 bg_color=(255, 255, 255)):
    """Draw one pose as filled joints + alpha-blended ellipse limbs.

    joints_position: (J, 2) or (J, 3) with confidence in the last channel —
    zero-confidence joints/limbs are skipped. colors: three RGB triples
    (left / middle / right). Returns [canvas, canvas_cropped] like
    vismo.py:89-213 (crop over the nonzero column range).
    """
    import cv2

    joints_position = np.asarray(joints_position)
    limbs, joints_lmr, limbs_lmr = _topology(joints_position.shape[0])
    cmap = {"L": rgb2rgba(colors[0]) if transparency else colors[0],
            "M": rgb2rgba(colors[1]) if transparency else colors[1],
            "R": rgb2rgba(colors[2]) if transparency else colors[2]}
    colors_joints = [cmap[c] for c in joints_lmr]
    colors_limbs = [cmap[c] for c in limbs_lmr]

    if transparency:
        canvas = np.zeros((H, W, 4))
    else:
        canvas = np.ones((H, W, 3)) * np.array(bg_color).reshape(1, 1, 3)

    joints_radius = 7
    for i in range(len(colors_joints)):
        if i in (17, 18) and joints_position.shape[0] == 49:
            continue  # eyes are not drawn (vismo.py:166-167)
        radius = 2 if i > 18 else joints_radius
        if joints_position.shape[1] == 3 and joints_position[i][2] == 0:
            continue
        cv2.circle(canvas,
                   (int(joints_position[i][0]), int(joints_position[i][1])),
                   radius, colors_joints[i], thickness=-1)

    canvas_cropped = canvas
    stickwidth = 2
    for i, (a, b) in enumerate(limbs):
        cur_canvas = canvas.copy()
        p1, p2 = joints_position[a], joints_position[b]
        if len(p1) == 3 and min(p1[2], p2[2]) == 0:
            bb = bounding_box(canvas)
            canvas_cropped = canvas[:, bb[2]:bb[3], :]
            continue
        X = [p1[1], p2[1]]
        Y = [p1[0], p2[0]]
        mX, mY = np.mean(X), np.mean(Y)
        length = ((X[0] - X[1]) ** 2 + (Y[0] - Y[1]) ** 2) ** 0.5
        angle = math.degrees(math.atan2(X[0] - X[1], Y[0] - Y[1]))
        polygon = cv2.ellipse2Poly((int(mY), int(mX)),
                                   (int(length / 2), stickwidth),
                                   int(angle), 0, 360, 1)
        cv2.fillConvexPoly(cur_canvas, polygon, colors_limbs[i])
        canvas = cv2.addWeighted(canvas, 0.4, cur_canvas, 0.6, 0)
        bb = bounding_box(canvas)
        canvas_cropped = canvas[:, bb[2]:bb[3], :]
    canvas = canvas.astype(imtype)
    canvas_cropped = canvas_cropped.astype(imtype)
    if grayscale:
        code = cv2.COLOR_RGBA2GRAY if transparency else cv2.COLOR_RGB2GRAY
        canvas = cv2.cvtColor(canvas, code)
        canvas_cropped = cv2.cvtColor(canvas_cropped, code)
    return [canvas, canvas_cropped]


def motion2video(motion, save_path, colors, h=512, w=512,
                 bg_color=(255, 255, 255), transparency=False,
                 motion_tgt=None, fps=25, save_frame=False, grayscale=False,
                 as_array=False):
    """2D skeleton video via the ellipse renderer (vismo.py:213-244).

    motion: (J, D, T) in the reference's channel-second layout (D=2 or 3
    with confidence). motion_tgt, when given, is blended UNDER the
    prediction (0.3 target / 0.7 prediction) for side-by-side comparison.
    """
    import cv2

    motion = np.asarray(motion)
    vlen = motion.shape[-1]
    out_array = np.zeros([vlen, h, w, 3]) if as_array else None
    frames = []

    if save_frame:
        frames_dir = save_path[:-4] + "-frames"
        os.makedirs(frames_dir, exist_ok=True)

    for i in range(vlen):
        img, img_cropped = joints2image(
            motion[:, :, i], colors, transparency=transparency,
            bg_color=bg_color, H=h, W=w, grayscale=grayscale)
        if motion_tgt is not None:
            img_tgt, _ = joints2image(
                motion_tgt[:, :, i], colors, transparency=transparency,
                bg_color=bg_color, H=h, W=w, grayscale=grayscale)
            img = cv2.addWeighted(img_tgt, 0.3, img, 0.7, 0)
            bb = bounding_box(img)
            img_cropped = img[:, bb[2]:bb[3], :]
        if save_frame:
            import imageio

            imageio.imwrite(os.path.join(frames_dir, "%04d.png" % i),
                            img_cropped)
        if as_array:
            out_array[i] = img
        else:
            frames.append(img)
    if as_array:
        return out_array
    return _save_video(frames, save_path, fps)


def vis_data_batch(data_input, data_label, n_render=10,
                   save_path="doodle/vis_train_data/"):
    """Render the first n pairs of a training batch (vismo.py:55-63).

    data_input: (N, T, J, 2|3); data_label: (N, T, J, 3).
    """
    os.makedirs(save_path, exist_ok=True)
    data_input = np.asarray(data_input)
    data_label = np.asarray(data_label)
    for i in range(min(len(data_input), n_render)):
        render_and_save(data_input[i][:, :, :2],
                        os.path.join(save_path, f"input_{i}.mp4"))
        render_and_save(data_label[i],
                        os.path.join(save_path, f"gt_{i}.mp4"))


def _save_video(frames, save_path, fps):
    import imageio

    try:
        imageio.mimsave(save_path, frames, fps=float(fps))
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
            # the reference's axis transform (vismo.py:275-280): camera
            # coords have y pointing down, so plot (-x, -z, -y) to show
            # the person upright instead of depth-as-vertical
            ax.plot([-pose[a, 0], -pose[b, 0]], [-pose[a, 2], -pose[b, 2]],
                    [-pose[a, 1], -pose[b, 1]], color=color, lw=2)
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        frames.append(buf.reshape(h, w, 4)[..., :3].copy())
    plt.close(fig)
    return _save_video(frames, save_path, fps)


def motion2video_2d(motion, save_path, fps=25):
    """motion: (T, 17, >=2) in pixel coords -> quick 2D line video (cv2).

    A lightweight alternative to the ellipse renderer for debugging; the
    reference-fidelity path is motion2video/joints2image.
    """
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
        # face the camera like the reference (vismo.py motion2video_mesh):
        # verts are camera-space (y down), default oblique view would show
        # the body lying flat
        ax.view_init(elev=-90, azim=-90)
        try:
            ax.set_proj_type("ortho")
        except Exception:
            pass
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
                    draw_face=False, faces=None, motion_tgt=None):
    """Shape-dispatching renderer (reference vismo.py:17-37 semantics):
    (T, J, 2) or with_conf -> 2D ellipse video in a 512-px box;
    (T, 6890, 3) -> mesh; (T, J, 3) -> 3D skeleton."""
    motion = np.asarray(motion_input, dtype=np.float32)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    if motion.ndim == 3 and motion.shape[1] == 6890:
        return motion2video_mesh(motion, save_path, fps=fps, faces=faces)
    if motion.ndim == 3 and (motion.shape[-1] == 2 or with_conf):
        colors = hex2rgb(color)

        def to_jdt(arr):  # (T,J,D) -> fresh (J,3,T); never a caller view
            a = np.transpose(arr, (1, 2, 0))
            full = np.ones((a.shape[0], 3, a.shape[2]), np.float32)
            full[:, :a.shape[1]] = a[:, :3]
            full[:, :2] = pixel2world_vis_motion(full[:, :2])
            return full

        m = to_jdt(motion)
        tgt = None if motion_tgt is None else \
            to_jdt(np.asarray(motion_tgt, np.float32))
        return motion2video(m, save_path, colors, fps=fps, motion_tgt=tgt)
    if motion.ndim == 3 and motion.shape[-1] == 3:
        return motion2video_3d(motion, save_path, fps=fps,
                               keep_imgs=keep_imgs)
    raise ValueError(f"cannot infer render mode for shape {motion.shape}")
