"""Backbone registry and factory (parity: /root/reference/lib/utils/learning.py:79-102).

The reference dispatches on `args.backbone` but only ships DSTformer (the
other branches import files that don't exist). We keep an extensible
registry with DSTformer registered.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from motionbert_tpu.models.dstformer import DSTformer

_BACKBONES: Dict[str, Callable] = {}

# The published MotionBERT architecture (README.md:78; configs/pose3d/*):
# the flagship model for benchmarks and the graft entry point.
FLAGSHIP_CONFIG = dict(dim_in=3, dim_out=3, dim_feat=512, dim_rep=512,
                       depth=5, num_heads=8, mlp_ratio=2, num_joints=17,
                       maxlen=243)

# MotionBERT-Lite (README.md:79; configs/pretrain/MB_lite.yaml): the
# zoo's second architecture — half the width, 4x mlp_ratio. C=256 is
# 128-aligned so the fused Pallas kernels apply unchanged.
LITE_CONFIG = dict(dim_in=3, dim_out=3, dim_feat=256, dim_rep=512,
                   depth=5, num_heads=8, mlp_ratio=4, num_joints=17,
                   maxlen=243)


def default_attn_impl() -> str:
    """Fused Pallas kernels on TPU; XLA elsewhere (interpreted Pallas would
    make CPU runs needlessly slow)."""
    import jax

    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def default_compute_dtype():
    """bfloat16 on TPU, float32 elsewhere.

    TPU fp32 matmuls already run at reduced MXU precision by default
    (~1e-3 output delta, docs/design.md), so bf16 compute — with fp32
    params, fp32 optimizer state, and fp32 softmax/LayerNorm accumulation
    inside the kernels — gives up no meaningful precision class while
    doubling MXU throughput. Override per run with the `bf16` config key
    (bf16: false forces fp32 compute on TPU)."""
    import jax

    return jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") \
        else jnp.float32


def register_backbone(name: str):
    def deco(fn):
        _BACKBONES[name] = fn
        return fn
    return deco


def _cfg_get(args, key, default=None):
    """Read a config key from EasyDict-like, plain-dict, or attr objects."""
    if hasattr(args, "get"):
        return args.get(key, default)
    return getattr(args, key, default)


@register_backbone("DSTformer")
def _dstformer(args, **overrides):
    kw = dict(
        dim_in=3,
        dim_out=3,
        dim_feat=_cfg_get(args, "dim_feat"),
        dim_rep=_cfg_get(args, "dim_rep"),
        depth=_cfg_get(args, "depth"),
        num_heads=_cfg_get(args, "num_heads"),
        mlp_ratio=_cfg_get(args, "mlp_ratio"),
        maxlen=_cfg_get(args, "maxlen"),
        num_joints=_cfg_get(args, "num_joints"),
    )
    kw.update(overrides)
    # fail at the config boundary, naming the key — a missing/typoed YAML
    # key would otherwise surface deep inside model.init as an opaque
    # TypeError on a None shape
    missing = [k for k, v in kw.items() if v is None and k != "dim_rep"]
    if missing:
        raise KeyError(
            f"backbone config is missing required key(s): {missing} "
            f"(check the YAML spelling)")
    return DSTformer(**kw)


def load_backbone(args, compute_dtype=None, attn_impl: str = None,
                  **overrides):
    """Build the backbone module named by args.backbone (default DSTformer).

    compute_dtype=None resolves from the `bf16` config key when present,
    else default_compute_dtype() (bf16 on TPU, f32 elsewhere). Params are
    always fp32 regardless; this only sets the matmul/activation dtype.

    attn_impl=None resolves from the `attn_impl` config key when present,
    else default_attn_impl() (fused Pallas on TPU, XLA elsewhere) — so the
    public API and serving paths get the fused kernels without every
    caller repeating the lookup."""
    name = _cfg_get(args, "backbone", "DSTformer")
    if name not in _BACKBONES:
        raise ValueError(f"Undefined backbone type: {name!r}; "
                         f"registered: {sorted(_BACKBONES)}")
    if compute_dtype is None:
        bf16 = _cfg_get(args, "bf16", None)
        compute_dtype = default_compute_dtype() if bf16 is None else \
            (jnp.bfloat16 if bf16 else jnp.float32)
    if attn_impl is None:
        attn_impl = _cfg_get(args, "attn_impl", None) or default_attn_impl()
    overrides.setdefault("dtype", compute_dtype)
    overrides.setdefault("attn_impl", attn_impl)
    return _BACKBONES[name](args, **overrides)
