"""PyTorch checkpoint -> Flax params conversion for released MotionBERT weights.

The reference ships checkpoints as torch state_dicts (train.py:46-54 saves
{'model_pos': state_dict, ...}, with 'module.' DataParallel prefixes). This
module maps those tensors onto the motionbert_tpu DSTformer / head param
pytrees. Pure numpy — torch is only needed by the caller to load .bin files
(tools/convert_checkpoint.py).

Mapping rules:
- nn.Linear weight (out, in) -> Dense kernel (in, out) [transposed]
- nn.LayerNorm weight/bias   -> LayerNorm scale/bias
- nn.BatchNorm1d weight/bias/running_mean/running_var -> BatchNorm
  scale/bias + batch_stats mean/var
- `blocks_st.{i}.` -> `blocks_st_{i}/`, `ts_attn.{i}.` -> `ts_attn_{i}/`
- `pre_logits.fc.` -> `pre_logits/` (the Tanh has no params)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def strip_module_prefix(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove DataParallel 'module.' prefixes (reference learning.py:56-58)."""
    return {
        (k[7:] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _set_nested(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_LIST_MODULES = ("blocks_st", "blocks_ts", "ts_attn")


def _torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """Map a torch state_dict key to its flax param path (the caller
    infers the tensor transform from the leaf name and module). Returns
    the path WITHOUT the leading collection ('params'/'batch_stats')."""
    parts = key.split(".")
    # collapse indexed module lists: blocks_st.0.x -> blocks_st_0.x
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _LIST_MODULES and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    # pre_logits.fc.weight -> pre_logits.weight
    if len(out) >= 2 and out[0] == "pre_logits" and out[1] == "fc":
        out = ["pre_logits"] + out[2:]
    return tuple(out)


# Module names whose 'weight' is a LayerNorm scale rather than a Linear kernel.
_LN_NAMES = re.compile(r"^(norm|norm1_s|norm1_t|norm2_s|norm2_t)$")


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    bn_names: Tuple[str, ...] = (),
) -> Dict[str, dict]:
    """Convert a (numpy-valued) torch state_dict into Flax variables.

    Returns {'params': ..., 'batch_stats': ...} (batch_stats only when BN
    tensors are present). bn_names: module names that are BatchNorm1d (their
    'weight' is a scale, not a kernel).
    """
    state_dict = strip_module_prefix(state_dict)
    params: dict = {}
    batch_stats: dict = {}

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value)
        path = _torch_key_to_flax_path(key)
        *mods, leaf = path
        parent = mods[-1] if mods else ""
        is_ln = bool(_LN_NAMES.match(parent))
        is_bn = parent in bn_names

        if leaf == "weight":
            if is_ln or is_bn:
                _set_nested(params, tuple(mods) + ("scale",), value)
            elif value.ndim == 2:
                _set_nested(params, tuple(mods) + ("kernel",), value.T)
            elif value.ndim == 1:
                # a 1-D torch 'weight' is a norm scale; if its module name
                # isn't in bn_names/_LN_NAMES, silently storing it under
                # 'kernel' would corrupt the tree — fail loudly instead
                raise ValueError(
                    f"1-D weight {key!r} from unrecognized norm module "
                    f"{parent!r}: pass it via bn_names or extend _LN_NAMES")
            else:
                _set_nested(params, tuple(mods) + ("kernel",), value)
        elif leaf == "bias":
            _set_nested(params, tuple(mods) + ("bias",), value)
        elif leaf == "running_mean":
            _set_nested(batch_stats, tuple(mods) + ("mean",), value)
        elif leaf == "running_var":
            _set_nested(batch_stats, tuple(mods) + ("var",), value)
        else:
            # plain parameters: pos_embed (1,J,C), temp_embed (1,T,1,C), ...
            _set_nested(params, path, value)

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def flax_to_torch_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (for exporting checkpoints back to torch format)."""
    result: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        arr = np.asarray(node)
        *mods, leaf = path
        # restore list indexing and pre_logits.fc
        tparts = []
        for m in mods:
            mm = re.match(r"^(blocks_st|blocks_ts|ts_attn)_(\d+)$", m)
            if mm:
                tparts += [mm.group(1), mm.group(2)]
            elif m == "pre_logits":
                tparts += ["pre_logits", "fc"]
            else:
                tparts.append(m)
        if leaf == "kernel":
            result[".".join(tparts + ["weight"])] = arr.T if arr.ndim == 2 else arr
        elif leaf == "scale":
            result[".".join(tparts + ["weight"])] = arr
        elif leaf == "bias":
            result[".".join(tparts + ["bias"])] = arr
        elif leaf == "mean":
            result[".".join(tparts + ["running_mean"])] = arr
        elif leaf == "var":
            result[".".join(tparts + ["running_var"])] = arr
        else:
            result[".".join(tparts + [leaf])] = arr

    walk(variables.get("params", {}), [])
    walk(variables.get("batch_stats", {}), [])
    return result
