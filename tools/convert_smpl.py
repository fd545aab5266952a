"""Convert the official SMPL model pickle (chumpy-serialized) into the
plain-numpy .npz consumed by motionbert_tpu.models.smpl.SMPLModel.

The official SMPL_NEUTRAL.pkl stores arrays as chumpy objects; this loader
unpickles them WITHOUT chumpy installed by shimming the chumpy module and
extracting the underlying ndarray. Also bundles the auxiliary regressors
the reference uses (J_regressor_h36m_correct.npy, J_regressor_extra.npy,
smpl_mean_params.npz — see /root/reference/lib/utils/utils_smpl.py:64-68).

Usage:
    python tools/convert_smpl.py --smpl_pkl data/mesh/SMPL_NEUTRAL.pkl \
        --data_dir data/mesh --out data/mesh/smpl_model.npz
"""

from __future__ import annotations

import argparse
import io
import os
import pickle
import sys
import types

import numpy as np


def _install_chumpy_shim():
    """A minimal fake chumpy so chumpy-pickled arrays unpickle to ndarrays."""
    if "chumpy" in sys.modules:
        return

    class Ch:
        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {})

        def __array__(self, dtype=None):
            x = np.asarray(self.__dict__.get("x"))
            return x.astype(dtype) if dtype else x

    ch = types.ModuleType("chumpy")
    ch.Ch = Ch
    ch_ch = types.ModuleType("chumpy.ch")
    ch_ch.Ch = Ch
    reordering = types.ModuleType("chumpy.reordering")
    for name in ("transpose", "Transpose", "Select"):
        setattr(reordering, name, Ch)
    ch.ch = ch_ch
    sys.modules["chumpy"] = ch
    sys.modules["chumpy.ch"] = ch_ch
    sys.modules["chumpy.reordering"] = reordering


def _to_np(x):
    if hasattr(x, "toarray"):  # scipy sparse (J_regressor)
        return np.asarray(x.toarray())
    return np.asarray(x)


def convert_smpl(smpl_pkl: str, out: str, data_dir: str | None = None):
    _install_chumpy_shim()
    with open(smpl_pkl, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    # SMPL pkl layout: v_template (V,3), shapedirs (V,3,10),
    # posedirs (V,3,207), J_regressor (24,V sparse), weights (V,24),
    # kintree_table (2,24), f (faces)
    arrays = {
        "v_template": _to_np(data["v_template"]).astype(np.float32),
        "shapedirs": _to_np(data["shapedirs"])[:, :, :10].astype(np.float32),
        "posedirs": _to_np(data["posedirs"]).astype(np.float32),
        "J_regressor": _to_np(data["J_regressor"]).astype(np.float32),
        "lbs_weights": _to_np(data["weights"]).astype(np.float32),
        "parents": _to_np(data["kintree_table"])[0].astype(np.int64),
        "faces": _to_np(data["f"]).astype(np.int64),
    }
    arrays["parents"][0] = -1

    if data_dir:
        h36m = os.path.join(data_dir, "J_regressor_h36m_correct.npy")
        extra = os.path.join(data_dir, "J_regressor_extra.npy")
        mean = os.path.join(data_dir, "smpl_mean_params.npz")
        if os.path.exists(h36m):
            arrays["J_regressor_h36m"] = np.load(h36m).astype(np.float32)
        if os.path.exists(extra):
            arrays["J_regressor_extra"] = np.load(extra).astype(np.float32)
        if os.path.exists(mean):
            z = np.load(mean)
            arrays["mean_pose"] = np.asarray(z["pose"], np.float32).ravel()
            arrays["mean_shape"] = np.asarray(z["shape"], np.float32).ravel()

    # identity rotation in the (3, 2) column-major rot6d layout
    arrays.setdefault(
        "mean_pose",
        np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), 24))
    arrays.setdefault("mean_shape", np.zeros(10, np.float32))

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out}: V={arrays['v_template'].shape[0]}, "
          f"faces={arrays['faces'].shape[0]}")


def make_synthetic_npz(out: str, num_verts: int = 128, seed: int = 0):
    """Write a synthetic small model npz (tests / smoke runs)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from motionbert_tpu.models.smpl import SMPLModel

    m = SMPLModel.synthetic(num_verts=num_verts, seed=seed)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez_compressed(
        out, v_template=m.v_template, shapedirs=m.shapedirs,
        posedirs=m.posedirs, J_regressor=m.J_regressor,
        lbs_weights=m.lbs_weights, parents=m.parents,
        J_regressor_h36m=m.J_regressor_h36m, mean_pose=m.mean_pose,
        mean_shape=m.mean_shape)
    print("wrote synthetic SMPL model to", out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--smpl_pkl", default="data/mesh/SMPL_NEUTRAL.pkl")
    p.add_argument("--data_dir", default="data/mesh")
    p.add_argument("--out", default="data/mesh/smpl_model.npz")
    p.add_argument("--synthetic", action="store_true",
                   help="write a synthetic test model instead")
    a = p.parse_args()
    if a.synthetic:
        make_synthetic_npz(a.out)
    else:
        convert_smpl(a.smpl_pkl, a.out, a.data_dir)
