"""Checkpoint manager with the reference's file-role semantics.

Parity target: /root/reference/train.py:46-54, 364-374 (and the same
pattern in train_action.py / train_mesh.py):
- `latest_epoch.ckpt` written every epoch,
- `epoch_{n}.ckpt` every `checkpoint_frequency` epochs,
- `best_epoch.ckpt` on metric improvement,
- auto-resume from `latest_epoch.ckpt` when present,
- payload: {epoch, lr, params, opt_state, extra_vars, best_metric}.

Format: pickle of a numpy-ified pytree (the reference uses torch.save, also
pickle). Device restore re-places leaves with jax.device_put. Tolerant
backbone-only loading mirrors load_pretrained_weights (learning.py:39-67):
name+shape-matched leaves are loaded, the rest keep their init values.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _build_payload(*, epoch: int, lr: float, params, opt_state=None,
                   extra_vars=None, best_metric=None,
                   meta: Optional[dict] = None) -> dict:
    return {
        "epoch": epoch,
        "lr": float(lr) if lr is not None else None,
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "extra_vars": _to_host(extra_vars) if extra_vars is not None else None,
        "best_metric": best_metric,
        "meta": meta or {},
    }


def _write_payload(path: str, payload: dict):
    _write_bytes(path, pickle.dumps(payload,
                                    protocol=pickle.HIGHEST_PROTOCOL))


def _write_bytes(path: str, blob: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic publish


def save_checkpoint(path: str, **kw):
    _write_payload(path, _build_payload(**kw))


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_any_checkpoint(path: str) -> dict:
    """load_checkpoint with transparent torch .bin/.pth ingestion (the
    reference evaluates/resumes released .bin files directly). Native
    checkpoints return the full payload (epoch/opt_state/lr/...); torch
    files yield {'params', maybe 'batch_stats'} only — torch optimizer
    state does not map onto optax, so a torch resume reinitializes the
    optimizer and schedule (callers treat the missing keys as defaults,
    mirroring the reference's missing-optimizer warning, train.py:297-299).
    """
    if path.endswith(".bin") or path.endswith(".pth"):
        return load_torch_checkpoint(path)
    return load_checkpoint(path)


def load_torch_checkpoint(path: str, model_key: str = "model_pos",
                          bn_names=("bn", "bn1", "bn2")) -> dict:
    """Read a reference torch .bin checkpoint into flax variables.

    Needs torch (CPU) installed. Returns {'params': ..., maybe 'batch_stats'}.
    bn_names: BatchNorm module names (their 1-D 'weight' is a scale, not a
    kernel) — covers the reference's action/mesh heads (model_action.py:10,
    model_mesh.py:17-18).
    """
    import torch

    from motionbert_tpu.models.convert import torch_state_dict_to_flax

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt[model_key] if model_key in ckpt else (
        ckpt.get("model", ckpt.get("state_dict", ckpt)))
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return torch_state_dict_to_flax(sd, bn_names=tuple(bn_names))


def save_params_npz(path: str, params, dtype=None, meta: dict = None):
    """Flat compressed-npz snapshot of a param pytree — the committed-
    artifact format (e.g. the task-gate anchor, tools/train_anchor.py).
    Keys are '/'-joined dict paths; optional `dtype` downcasts for size
    (f16 halves a flagship snapshot); `meta` is a JSON dict stored under
    '__meta__'. Atomic write (tmp + rename)."""
    import json

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path_keys, v in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path_keys)
        a = np.asarray(jax.device_get(v))
        out[key] = a.astype(dtype) if dtype is not None else a
    if meta:
        out["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), np.uint8).copy()
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **out)
    # np.savez appends .npz to a name without it
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_params_npz(path: str, dtype=np.float32) -> tuple:
    """Inverse of save_params_npz: returns (nested params dict, meta)."""
    import json

    z = np.load(path)
    meta = {}
    params: dict = {}
    for key in z.files:
        if key == "__meta__":
            meta = json.loads(z[key].tobytes().decode())
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = z[key]
        node[parts[-1]] = arr.astype(dtype) if dtype is not None else arr
    return params, meta


def load_pretrained_params(init_params, ckpt_params) -> tuple:
    """Tolerant weight loading: copy leaves whose path+shape match; keep
    init values elsewhere. Returns (params, matched, discarded) where
    matched/discarded are lists of path strings.
    """
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_params)[0])
    flat_ckpt = dict(jax.tree_util.tree_flatten_with_path(ckpt_params)[0])
    matched, discarded = [], []
    out = {}
    for path, v in flat_init.items():
        key = jax.tree_util.keystr(path)
        if path in flat_ckpt and flat_ckpt[path].shape == v.shape:
            out[path] = flat_ckpt[path]
            matched.append(key)
        else:
            out[path] = v
            discarded.append(key)
    treedef = jax.tree_util.tree_structure(init_params)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), matched, discarded


class CheckpointManager:
    """Directory-level manager implementing the reference's roles."""

    LATEST = "latest_epoch.ckpt"
    BEST = "best_epoch.ckpt"

    def __init__(self, directory: str, frequency: int = 1):
        self.dir = directory
        self.frequency = max(int(frequency), 1)
        os.makedirs(directory, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    @property
    def latest_path(self) -> str:
        return self.path(self.LATEST)

    def has_latest(self) -> bool:
        return os.path.exists(self.latest_path)

    def save_epoch(self, epoch: int, lr, params, opt_state=None,
                   extra_vars=None, best_metric=None, improved: bool = False,
                   meta=None):
        """Write latest (always), epoch_{n} (on frequency), best (if improved).

        Matches reference train.py:364-374: epoch_{n} gated on
        (epoch + 1) % checkpoint_frequency == 0, and the payload records
        epoch + 1 — the epoch resume should START from (train.py:49,297).
        """
        # ONE device->host sweep + ONE serialization; the pickled bytes
        # are then written up to 3 times — per-role save_checkpoint calls
        # would re-fetch the whole params/opt_state over the slow
        # remote-RPC link (and re-pickle the multi-hundred-MB tree) each
        # time
        blob = pickle.dumps(
            _build_payload(epoch=epoch + 1, lr=lr, params=params,
                           opt_state=opt_state, extra_vars=extra_vars,
                           best_metric=best_metric, meta=meta),
            protocol=pickle.HIGHEST_PROTOCOL)
        _write_bytes(self.latest_path, blob)
        if (epoch + 1) % self.frequency == 0:
            _write_bytes(self.path(f"epoch_{epoch}.ckpt"), blob)
        if improved:
            _write_bytes(self.path(self.BEST), blob)

    def load_latest(self) -> Optional[dict]:
        if self.has_latest():
            return load_checkpoint(self.latest_path)
        return None
