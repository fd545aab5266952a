"""Spatio-temporal attention cores.

DSTformer attends alternately over the joint axis ("spatial", J=17 tokens)
and the frame axis ("temporal", F<=243 tokens) of a (B, F, J, C) sequence
(behavior parity: /root/reference/lib/model/DSTformer.py:178-200). Both are
tiny-sequence attentions batched over the complementary axis, so on TPU the
win is batching + fusion, not FlashAttention-style tiling: we keep q/k/v in
a (batch, heads, tokens, head_dim) layout where `batch` absorbs B*F or B*J
and let one fused softmax(QK^T)V run on the MXU.

Two implementations:
- "xla": jnp.einsum formulation (default; XLA fuses this well on TPU).
- "pallas": fused Pallas kernel for the temporal path (the compute hot spot)
  batching rows of (F, d) attention into MXU-aligned tiles. Falls back to
  "xla" on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sdpa(q, k, v, scale):
    """softmax(q k^T * scale) v over the second-to-last axis.

    q, k, v: (..., N, d). Softmax accumulates in float32 for bf16 inputs.
    """
    attn = jnp.einsum("...nd,...md->...nm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...nm,...md->...nd", attn, v)


def st_attention(q, k, v, mode: str, scale: float, impl: str = "xla"):
    """Dual-axis attention on (B, F, J, H, d) tensors.

    mode="spatial": tokens are the J joints of one frame (attend within
    frame). mode="temporal": tokens are the F frames of one joint (attend
    along time). Returns (B, F, J, H, d).
    """
    if mode == "spatial":
        # (B, F, H, J, d)
        qt = jnp.einsum("bfjhd->bfhjd", q)
        kt = jnp.einsum("bfjhd->bfhjd", k)
        vt = jnp.einsum("bfjhd->bfhjd", v)
        out = _sdpa(qt, kt, vt, scale)
        return jnp.einsum("bfhjd->bfjhd", out)
    if mode == "temporal":
        qt = jnp.einsum("bfjhd->bjhfd", q)
        kt = jnp.einsum("bfjhd->bjhfd", k)
        vt = jnp.einsum("bfjhd->bjhfd", v)
        if impl == "pallas" and q.shape[1] >= 16 and _on_tpu():
            out = _temporal_attention_pallas(qt, kt, vt, scale)
        else:
            out = _sdpa(qt, kt, vt, scale)
        return jnp.einsum("bjhfd->bfjhd", out)
    raise ValueError(f"unknown st_attention mode: {mode}")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("scale",))
def _temporal_attention_pallas(q, k, v, scale):
    """Fused attention over the frame axis via Pallas.

    q, k, v: (B, J, H, F, d). Grid over the fused (B*J*H) row-batch; each
    program computes softmax(QK^T)V for one (F, d) tile entirely in VMEM.
    F<=243 and d<=64 so one row's working set (3*F*d + F*F floats < 400 KB)
    fits VMEM comfortably.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, J, H, F, d = q.shape
    rows = B * J * H
    qf = q.reshape(rows, F, d)
    kf = k.reshape(rows, F, d)
    vf = v.reshape(rows, F, d)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]  # (F, d)
        kb = k_ref[0]
        vb = v_ref[0]
        attn = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        o_ref[0] = jax.lax.dot_general(
            attn.astype(qb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(qb.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, F, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, F, d), q.dtype),
    )(qf, kf, vf)
    return out.reshape(B, J, H, F, d)
