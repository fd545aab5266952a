"""AMASS SMPL sequences -> H36M-17 joints via the JAX SMPL layer
(parity surface: /root/reference/tools/preprocess_amass.py, which uses
human_body_prior's BodyModel; here the in-repo SMPL layer does the forward).

For each downsampled motion (from compress_amass.py): run SMPL on the
per-frame poses/betas and regress H36M-17 joints with J_regressor_h36m.

Usage: python tools/preprocess_amass.py --motions_pkl ... --smpl_npz ...
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def amass_to_h36m_joints(all_motions, smpl_model, batch_frames=512):
    """all_motions: list of dicts with 'poses' (N, >=72), 'betas' (>=10),
    'trans' (N, 3). Returns list of (17, N, 3) joint sequences."""
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.models.smpl import smpl_forward, vertices2joints

    @jax.jit
    def fwd(betas, pose, trans):
        out = smpl_forward(smpl_model, betas, pose, pose2rot=True,
                           transl=trans)
        return vertices2joints(smpl_model.J_regressor_h36m, out["vertices"])

    sequences = []
    for x in all_motions:
        # AMASS poses are SMPL-H: [0:3] root + [3:66] 21 body joints +
        # [66:] finger articulation. SMPL's two hand joints (22, 23) have
        # no SMPL-H equivalent in the body block — zero them rather than
        # aliasing finger parameters onto them.
        raw = np.asarray(x["poses"], np.float32)
        n = len(raw)
        poses = np.zeros((n, 72), np.float32)
        poses[:, :66] = raw[:, :66]
        betas = np.broadcast_to(
            np.asarray(x.get("betas", np.zeros(10)), np.float32)[:10],
            (n, 10)).copy()
        trans = np.asarray(x.get("trans", np.zeros((n, 3))), np.float32)
        joints = []
        for st in range(0, n, batch_frames):
            end = min(st + batch_frames, n)
            pad = batch_frames - (end - st)
            b = np.concatenate([betas[st:end], betas[end - 1:end].repeat(pad, 0)])
            p = np.concatenate([poses[st:end], poses[end - 1:end].repeat(pad, 0)])
            t = np.concatenate([trans[st:end], trans[end - 1:end].repeat(pad, 0)])
            j = np.asarray(fwd(jnp.asarray(b), jnp.asarray(p),
                               jnp.asarray(t)))[: end - st]
            joints.append(j)
        joints = np.concatenate(joints)              # (N, 17, 3)
        sequences.append(np.transpose(joints, (1, 0, 2)))  # (17, N, 3)
    return sequences


def main(motions_pkl, smpl_npz, out_pkl):
    from motionbert_tpu.models.smpl import SMPLModel

    with open(motions_pkl, "rb") as f:
        all_motions = pickle.load(f)
    smpl_model = SMPLModel.from_npz(smpl_npz)
    sequences = amass_to_h36m_joints(all_motions, smpl_model)
    with open(out_pkl, "wb") as f:
        pickle.dump(sequences, f)
    print(f"wrote {len(sequences)} joint sequences to {out_pkl}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--motions_pkl", default="data/AMASS/all_motions_fps60.pkl")
    p.add_argument("--smpl_npz", default="data/mesh/smpl_model.npz")
    p.add_argument("--out_pkl", default="data/AMASS/amass_joints_h36m_60.pkl")
    a = p.parse_args()
    main(a.motions_pkl, a.smpl_npz, a.out_pkl)
