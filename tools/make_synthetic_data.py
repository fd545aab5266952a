"""Generate small synthetic datasets in the exact on-disk formats the
framework consumes, for end-to-end tests and smoke training without the
real (license-gated) datasets.

Formats mirror what the reference pipeline reads:
- H36M source pickle (h36m_sh_conf_cam_source_final.pkl layout)
- MB3D clip directory (file-per-clip pkls, tools/convert_h36m.py output)
- AlphaPose Halpe-26 JSON (infer_wild input)
- pyskl action pickle ({split, annotations}, dataset_action.py input)
- mesh pickle (datareader_mesh input with SMPL params)

Usage: python tools/make_synthetic_data.py [out_root]
"""

from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np

H36M_CAMERAS = ["54138969", "60457274", "55011271", "58860488"]
ACTIONS = ["Directions", "Sitting", "Walking"]

# Dataset-FAMILY constant for the learnable-z mapping (independent of the
# per-pickle `seed`): every learnable_z pickle shares the same xy->z map,
# so a model trained on one pickle (e.g. seed=1 train data) generalizes to
# another's test split (e.g. the seed=0 bench task-gate mirror) with no
# train/test leakage between the two rng streams.
LEARNABLE_Z_SEED = 20260819
_MOTION_CENTER_XY = np.asarray([500.0, 500.0])
_MOTION_SCALE = 80.0


def _learnable_z_map():
    """Fixed linear map from the centered 17x2 pose to 17 depths, scaled so
    z dynamics match the default generator's 0.3*scale amplitude."""
    rng = np.random.RandomState(LEARNABLE_Z_SEED)
    return rng.normal(0.0, 0.3 * _MOTION_SCALE / np.sqrt(34.0),
                      (34, 17)).astype(np.float64)


def _smooth_motion(rng, n_frames, n_joints=17, dim=3, scale=80.0,
                   center=(500.0, 500.0, 0.0)):
    """Smooth random joint trajectories (sum of low-frequency sinusoids)."""
    t = np.linspace(0, 2 * np.pi, n_frames)[:, None, None]
    phases = rng.uniform(0, 2 * np.pi, (1, n_joints, dim))
    freqs = rng.uniform(0.5, 2.0, (1, n_joints, dim))
    base = rng.uniform(-1, 1, (1, n_joints, dim)) * scale
    motion = base + 0.3 * scale * np.sin(freqs * t + phases)
    return motion + np.asarray(center)[:dim]


def make_h36m_pickle(path, n_frames_per_video=64, seed=0,
                     include_blocked=True, learnable_z=False,
                     train_subjects=(1, 5), train_videos=3):
    """Synthetic pickle with the H36M source-file layout.

    learnable_z=True replaces the independent random depth channel with a
    FIXED dataset-family linear function of the (clean) 2D pose, so the
    2D->3D lifting task is actually solvable — a trained model's MPJPE
    lands in the tens of mm like the reference's real operating point
    (needed to anchor the quantized-tier task gate on trained weights,
    bench._task_gate_mpjpe). Depth stays smooth (a linear map of smooth
    trajectories) and the noisy 2D observations keep a non-zero floor.
    """
    rng = np.random.RandomState(seed)
    z_map = _learnable_z_map() if learnable_z else None

    def make_split(subjects, n_videos):
        joint_2d, conf, joint3d, factor, cams, sources, actions = \
            [], [], [], [], [], [], []
        vid = 0
        for s in subjects:
            for a_idx in range(n_videos):
                action = ACTIONS[a_idx % len(ACTIONS)]
                cam = H36M_CAMERAS[vid % len(H36M_CAMERAS)]
                # blocked-source naming matches train.py:109-111 semantics
                if include_blocked and s == 9 and a_idx == 0:
                    src = "s_09_act_05_subact_02_ca_%02d" % (vid % 4 + 1)
                else:
                    src = "s_%02d_act_%02d_subact_01_ca_%02d" % (
                        s, a_idx + 2, vid % 4 + 1)
                n = n_frames_per_video + (vid % 3) * 7  # uneven lengths
                m3d = _smooth_motion(rng, n)
                if z_map is not None:
                    xy_c = (m3d[..., :2] - _MOTION_CENTER_XY) / _MOTION_SCALE
                    m3d[..., 2] = xy_c.reshape(n, 34) @ z_map
                m3d[..., 2] += rng.uniform(100, 200)
                joint3d.append(m3d)
                joint_2d.append(m3d[..., :2] + rng.normal(0, 2, (n, 17, 2)))
                conf.append(rng.uniform(0.5, 1.0, (n, 17)))
                factor.append(np.full(n, rng.uniform(8, 12)))
                cams += [cam] * n
                sources += [src] * n
                actions += [action] * n
                vid += 1
        joint3d = np.concatenate(joint3d).astype(np.float32)
        factor = np.concatenate(factor).astype(np.float32)
        return {
            "joint_2d": np.concatenate(joint_2d).astype(np.float32),
            "confidence": np.concatenate(conf).astype(np.float32),
            "joint3d_image": joint3d,
            "joints_2.5d_image": joint3d * factor[:, None, None],
            "2.5d_factor": factor,
            "camera_name": np.array(cams),
            "source": np.array(sources, dtype=object),
            "action": np.array(actions, dtype=object),
        }

    data = {"train": make_split(list(train_subjects), train_videos),
            "test": make_split([9, 11], 3)}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def make_wild_json(path, n_frames=40, n_people=1, seed=0):
    """Synthetic AlphaPose Halpe-26 detections (dataset_wild.py input)."""
    rng = np.random.RandomState(seed)
    results = []
    for p in range(n_people):
        motion = _smooth_motion(rng, n_frames, n_joints=26, dim=2,
                                scale=100.0, center=(320.0, 240.0))
        for f in range(n_frames):
            kpts = np.concatenate(
                [motion[f], rng.uniform(0.5, 1, (26, 1))], axis=1)
            results.append({
                "image_id": f"{f}.jpg",
                "idx": p,
                "keypoints": kpts.ravel().tolist(),
                "score": 2.5,
            })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f)
    return path


def make_action_pickle(path, n_samples=24, n_classes=6, seed=0,
                       split_names=("xsub_train", "xsub_val")):
    """Synthetic pyskl-format action pickle (dataset_action.py input)."""
    rng = np.random.RandomState(seed)
    annotations = []
    split = {name: [] for name in split_names}
    for i in range(n_samples):
        n = int(rng.randint(40, 120))
        n_person = 1 + (i % 2)
        kp = np.stack([
            _smooth_motion(rng, n, n_joints=17, dim=2, scale=60.0,
                           center=(480.0, 270.0))
            for _ in range(n_person)])
        ann = {
            "frame_dir": f"S{i:03d}",
            "total_frames": n,
            "img_shape": (540, 960),
            "keypoint": kp.astype(np.float32),
            "keypoint_score": rng.uniform(0.5, 1.0, (n_person, n, 17)).astype(np.float32),
            "label": int(i % n_classes),
        }
        annotations.append(ann)
        split[split_names[0] if i % 4 != 3 else split_names[1]].append(
            ann["frame_dir"])
    data = {"split": split, "annotations": annotations}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def make_mesh_pickle(path, n_videos=4, n_frames=48, seed=0):
    """Synthetic mesh pickle (datareader_mesh input: 2D joints + SMPL GT)."""
    rng = np.random.RandomState(seed)

    def split(n_vids, subj):
        joint_2d, conf, pose, shape, sources = [], [], [], [], []
        for v in range(n_vids):
            n = n_frames + v * 5
            m2d = _smooth_motion(rng, n, dim=2, scale=60.0,
                                 center=(320.0, 320.0))
            joint_2d.append(m2d)
            conf.append(rng.uniform(0.5, 1, (n, 17)))
            pose.append(rng.normal(0, 0.3, (n, 72)))
            shape.append(np.repeat(rng.normal(0, 1.0, (1, 10)), n, axis=0))
            sources += [f"{subj}_vid{v:02d}"] * n
        return {
            "joint_2d": np.concatenate(joint_2d).astype(np.float32),
            "confidence": np.concatenate(conf).astype(np.float32),
            "smpl_pose": np.concatenate(pose).astype(np.float32),
            "smpl_shape": np.concatenate(shape).astype(np.float32),
            "source": np.array(sources, dtype=object),
        }

    data = {"train": split(n_videos, "train"), "test": split(2, "test")}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def make_posetrack_json(dirpath, n_files=2, n_tracks=3, n_frames=35, seed=0):
    """Synthetic PoseTrack18 annotation JSONs (dataset_motion_2d.py input)."""
    rng = np.random.RandomState(seed)
    os.makedirs(dirpath, exist_ok=True)
    for fi in range(n_files):
        annotations = []
        for tid in range(n_tracks):
            motion = _smooth_motion(rng, n_frames, n_joints=17, dim=2,
                                    scale=80.0, center=(300.0, 300.0))
            # PoseTrack keypoint channel 2 is a 0/1 visibility flag; the
            # dataset's filters (>=306 valid joints, root visible in all 30
            # frames) assume that. Hips (11, 12) stay visible.
            conf = (rng.uniform(0, 1, (n_frames, 17, 1)) > 0.1).astype(float)
            conf[:, 11] = 1.0
            conf[:, 12] = 1.0
            for f in range(n_frames):
                kpts = np.concatenate([motion[f], conf[f]], axis=1)
                annotations.append({
                    "track_id": tid,
                    "image_id": f,
                    "keypoints": kpts.ravel().tolist(),
                })
        with open(os.path.join(dirpath, f"seq{fi:03d}.json"), "w") as f:
            json.dump({"annotations": annotations,
                       "images": [{"id": i} for i in range(n_frames)]}, f)
    return dirpath


def make_instav_npy(dirpath, n_videos=4, frames_per_video=100, seed=0):
    """Synthetic InstaVariety motion_all.npy + id_all.npy."""
    rng = np.random.RandomState(seed)
    os.makedirs(dirpath, exist_ok=True)
    motions, ids = [], []
    for v in range(n_videos):
        n = frames_per_video + v * 13
        m = _smooth_motion(rng, n, n_joints=17, dim=2, scale=0.3,
                           center=(0.0, 0.0))
        conf = rng.uniform(0.3, 1.0, (n, 17, 1))
        motions.append(np.concatenate([m, conf], axis=-1))
        ids += [v] * n
    np.save(os.path.join(dirpath, "motion_all.npy"),
            np.concatenate(motions).astype(np.float32))
    np.save(os.path.join(dirpath, "id_all.npy"), np.array(ids))
    return dirpath


def make_all(root):
    make_h36m_pickle(os.path.join(root, "motion3d",
                                  "h36m_synth_cam_source.pkl"))
    # clip directory via the real converter
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.convert_h36m import convert_h36m

    convert_h36m(dt_root=os.path.join(root, "motion3d"),
                 dt_file="h36m_synth_cam_source.pkl",
                 out_root=os.path.join(root, "motion3d", "MB3D_f16s8",
                                       "H36M-SYN"),
                 n_frames=16, data_stride=8)
    make_wild_json(os.path.join(root, "wild", "alphapose_results.json"))
    make_action_pickle(os.path.join(root, "action", "ntu_synth.pkl"))
    make_mesh_pickle(os.path.join(root, "mesh", "mesh_synth.pkl"))
    from tools.convert_smpl import make_synthetic_npz

    make_synthetic_npz(os.path.join(root, "mesh", "smpl_model.npz"))
    print("synthetic data written under", root)


if __name__ == "__main__":
    make_all(sys.argv[1] if len(sys.argv) > 1 else "data/synthetic")
