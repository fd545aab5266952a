"""Fused transformer sub-block PAIR kernel: one single-axis attention
sub-block followed by its MLP sub-block —

    y   = x + proj(attn(qkv(LN1(x))))
    out = y + fc2(GELU(fc1(LN2(y))))

— in ONE Pallas kernel, so the intermediate activation y never touches HBM
(the separate attention-block and MLP-block kernels each round-trip the full
(B, F, J, C) stream between them; at flagship dims that is ~1 GB of HBM
traffic per pair per forward at B=128). Numerics match the sequential
composition exactly: y is rounded to the compute dtype before LN2, exactly
as the standalone MLP kernel would read it from HBM.

Grid/block layout mirrors ops.attention._fused_block_pallas: temporal mode
grids (batch-block, joint) over (bb, F, C) slices; spatial mode grids
(batch-block, frame-tile) over (bb, 8*J, C) slices with the block-diagonal
frame mask. The MLP half is token-wise, so it rides the same blocks free.

Backward (custom VJP) recomputes y with the standalone fused attention
kernel and chains the two existing fused backward kernels — under
jax.checkpoint (the shipped training default) the whole pair is recomputed
anyway, so training inherits the forward fusion at no extra residual cost.

Behavior parity target: /root/reference/lib/model/DSTformer.py:214-245
(Block.forward: x + attn(norm1(x)); x + mlp(norm2(x))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionbert_tpu.ops.attention import (
    _attn_rows, _dot, _fused_block_bwd_pallas, _fused_block_pallas,
    _fused_block_xla, _ln_rows, _on_tpu)
from motionbert_tpu.ops.fused_mlp import _erf, _fused_mlp_bwd_pallas, \
    _fused_mlp_xla


def _spatial_masks(N, num_joints, total_tokens):
    from jax.experimental import pallas as pl

    start = pl.program_id(1) * N
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) + start
    row_valid = row_ids < total_tokens
    row_f = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) // num_joints
    col_f = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1) // num_joints
    return row_valid, row_f == col_f


def _pair_rows(xb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref,
               wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref,
               ln2_b_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    """One token group through attention sub-block + MLP sub-block; returns
    the (N, C) output in the compute dtype."""
    dtype = xb.dtype
    # --- attention sub-block ---
    h = _ln_rows(xb, ln1_s_ref[0], ln1_b_ref[0]).astype(dtype)
    qkv = _dot(h, wqkv_ref[:]) + bqkv_ref[0]            # (N, 3C) f32
    attn = _attn_rows(qkv, num_heads, scale, same_mask, dtype)
    y = _dot(attn, wproj_ref[:]) + bproj_ref[0] \
        + xb.astype(jnp.float32)                        # (N, C) f32
    # exact parity with the two-kernel composition: the standalone MLP
    # kernel reads y from HBM in the compute dtype
    yb = y.astype(dtype)
    # --- MLP sub-block ---
    h2 = _ln_rows(yb, ln2_s_ref[0], ln2_b_ref[0]).astype(dtype)
    z = _dot(h2, w1_ref[:]) + b1_ref[0]                 # (N, hidden) f32
    z = 0.5 * z * (1.0 + _erf(z * np.float32(0.7071067811865476)))
    out = _dot(z.astype(dtype), w2_ref[:]) + b2_ref[0] \
        + yb.astype(jnp.float32)
    return out.astype(dtype)


def _pair_kernel(num_heads, scale, bb, num_joints, total_tokens, mode,
                 x_ref, ln1_s_ref, ln1_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref):
    N = x_ref.shape[1]
    row_valid, same_mask = (None, None) if mode != "spatial" else \
        _spatial_masks(N, num_joints, total_tokens)
    for b in range(bb):
        xb = x_ref[b]  # (N, C)
        if row_valid is not None:
            xb = jnp.where(row_valid, xb, 0)
        o_ref[b] = _pair_rows(
            xb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref, wqkv_ref,
            bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref,
            b1_ref, w2_ref, b2_ref).astype(o_ref.dtype)


def _gated_pair_kernel(num_heads, scale, bb, num_joints, total_tokens, mode,
                       x_ref, other_ref, ln1_s_ref, ln1_b_ref, wqkv_ref,
                       bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref, wga_ref, wgb_ref,
                       bg_ref, o_ref):
    """Pair + att_fuse gate epilogue: the pair output is this layer's T->S
    stream, other_ref its S->T twin; emit the per-channel softmax-gated mix
    (reference DSTformer.py:340-351) without a separate gate pass over HBM.
    wga applies to `other` (the concat's first half), wgb to the pair out.
    """
    N = x_ref.shape[1]
    row_valid, same_mask = (None, None) if mode != "spatial" else \
        _spatial_masks(N, num_joints, total_tokens)
    for b in range(bb):
        xb = x_ref[b]
        if row_valid is not None:
            xb = jnp.where(row_valid, xb, 0)
        out = _pair_rows(
            xb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref, wqkv_ref,
            bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref,
            b1_ref, w2_ref, b2_ref)
        other = other_ref[b]
        s = (_dot(other, wga_ref[:]) + _dot(out, wgb_ref[:])
             + bg_ref[0].astype(jnp.float32))               # (N, 2) f32
        s0, s1 = s[:, 0:1], s[:, 1:2]
        m = jnp.maximum(s0, s1)
        e0 = jnp.exp(s0 - m)
        e1 = jnp.exp(s1 - m)
        inv = 1.0 / (e0 + e1)
        a0 = (e0 * inv).astype(out.dtype)
        a1 = (e1 * inv).astype(out.dtype)
        o_ref[b] = (other * a0 + out * a1).astype(o_ref.dtype)


def _pick_pair_batch_block(B, N, C, hidden, itemsize,
                           budget: int = 20 << 20) -> int:
    """Largest divisor of B whose per-b f32 intermediates (qkv + hidden +
    attn/y) fit the VMEM budget alongside the resident weights."""
    weights = (3 * C * C + C * C + 2 * C * hidden) * itemsize
    per_b = N * (3 * C + hidden + 3 * C) * 4 + 4 * N * C * itemsize
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and weights + bb * per_b <= budget:
            return bb
    return 1


def _pair_pallas(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                 w1, b1, w2, b2, num_heads, scale, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, J, C = x.shape
    hidden = w1.shape[1]
    if mode == "temporal":
        N, total = F, None
        x2 = x.reshape(B, F, J * C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
        out_shape = (B, F, J * C)
    else:
        tf = 8  # 8*J rows per tile: sublane-aligned for any J
        N, total = tf * J, F * J
        x2 = x.reshape(B, F * J, C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, N, C), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, (F + tf - 1) // tf)
        out_shape = (B, F * J, C)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, num_heads, scale, bb, J, total, mode),
        grid=grid,
        in_specs=[x_spec, const((1, C)), const((1, C)),
                  const(wqkv.shape), const((1, bqkv.shape[-1])),
                  const(wproj.shape), const((1, bproj.shape[-1])),
                  const((1, C)), const((1, C)),
                  const(w1.shape), const((1, b1.shape[-1])),
                  const(w2.shape), const((1, b2.shape[-1]))],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=not _on_tpu(),
    )(x2, ln1_s.reshape(1, -1), ln1_b.reshape(1, -1), wqkv,
      bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1),
      ln2_s.reshape(1, -1), ln2_b.reshape(1, -1), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1))
    return out.reshape(B, F, J, C)


def _pair_xla(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
              w1, b1, w2, b2, num_heads, scale, mode):
    """Reference composition of the two standalone XLA blocks."""
    y = _fused_block_xla(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                         num_heads, scale, mode, True, True)
    return _fused_mlp_xla(y, ln2_s, ln2_b, w1, b1, w2, b2, True, True)


def _gate_xla(other, out, wg, bg):
    """att_fuse gate (reference DSTformer.py:340-351): per-channel softmax
    over [other, out] scores; wg rows [:C] belong to `other`."""
    C = other.shape[-1]
    alpha = (other @ wg[:C].astype(other.dtype)
             + out @ wg[C:].astype(other.dtype) + bg.astype(other.dtype))
    alpha = jax.nn.softmax(alpha.astype(jnp.float32),
                           axis=-1).astype(other.dtype)
    return other * alpha[..., 0:1] + out * alpha[..., 1:2]


def _gated_pair_xla(x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                    ln2_s, ln2_b, w1, b1, w2, b2, wg, bg, num_heads, scale,
                    mode):
    out = _pair_xla(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                    w1, b1, w2, b2, num_heads, scale, mode)
    return _gate_xla(other, out, wg, bg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_pair_block(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                     ln2_b, w1, b1, w2, b2, num_heads, scale, mode):
    """LN1 -> qkv -> attention -> proj -> +x -> LN2 -> fc1 -> GELU -> fc2
    -> +y in one kernel. Always pre-LN + residual (the only composition the
    DSTformer Block uses on the fused path)."""
    return _pair_pallas(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                        ln2_b, w1, b1, w2, b2, num_heads, scale, mode)


def _pair_fwd(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
              w1, b1, w2, b2, num_heads, scale, mode):
    out = fused_pair_block(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                           ln2_b, w1, b1, w2, b2, num_heads, scale, mode)
    return out, (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                 w1, b1, w2, b2)


def _pair_bwd(num_heads, scale, mode, res, g):
    """Recompute y with the standalone fused attention kernel, then chain
    the two existing fused backward kernels."""
    (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2) = res
    y = _fused_block_pallas(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                            num_heads, scale, mode, True, True)
    dy, dls2, dlb2, dw1, db1, dw2, db2 = _fused_mlp_bwd_pallas(
        y, ln2_s, ln2_b, w1, b1, w2, True, True, g)
    dx, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj = _fused_block_bwd_pallas(
        x, ln1_s, ln1_b, wqkv, bqkv, wproj, num_heads, scale, mode,
        True, True, dy)
    return (dx, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2, dlb2,
            dw1, db1, dw2, db2)


fused_pair_block.defvjp(_pair_fwd, _pair_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18))
def fused_gated_pair_block(x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                           ln2_s, ln2_b, w1, b1, w2, b2, wg, bg, num_heads,
                           scale, mode):
    """fused_pair_block + the layer's att_fuse gate in the SAME kernel:
    emits softmax-gate(other, pair(x)) directly, saving the separate gate
    pass over the (B, F, J, C) stream (~5 ms/layer at flagship dims).
    wg: (2C, 2) with rows [:C] scoring `other` (the reference concat order,
    DSTformer.py:340-351); bg: (2,)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, J, C = x.shape
    hidden = w1.shape[1]
    if mode == "temporal":
        N, total = F, None
        reshape = (B, F, J * C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
    else:
        tf = 8
        N, total = tf * J, F * J
        reshape = (B, F * J, C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, N, C), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, (F + tf - 1) // tf)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_gated_pair_kernel, num_heads, scale, bb, J,
                          total, mode),
        grid=grid,
        in_specs=[x_spec, x_spec, const((1, C)), const((1, C)),
                  const(wqkv.shape), const((1, bqkv.shape[-1])),
                  const(wproj.shape), const((1, bproj.shape[-1])),
                  const((1, C)), const((1, C)),
                  const(w1.shape), const((1, b1.shape[-1])),
                  const(w2.shape), const((1, b2.shape[-1])),
                  const((C, 2)), const((C, 2)), const((1, 2))],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(reshape, x.dtype),
        interpret=not _on_tpu(),
    )(x.reshape(reshape), other.reshape(reshape),
      ln1_s.reshape(1, -1), ln1_b.reshape(1, -1), wqkv,
      bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1),
      ln2_s.reshape(1, -1), ln2_b.reshape(1, -1), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1), wg[:x.shape[-1]], wg[x.shape[-1]:],
      bg.reshape(1, -1))
    return out.reshape(B, F, J, C)


def _gated_pair_fwd(x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                    ln2_s, ln2_b, w1, b1, w2, b2, wg, bg, num_heads, scale,
                    mode):
    out = fused_gated_pair_block(x, other, ln1_s, ln1_b, wqkv, bqkv, wproj,
                                 bproj, ln2_s, ln2_b, w1, b1, w2, b2, wg,
                                 bg, num_heads, scale, mode)
    return out, (x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                 ln2_b, w1, b1, w2, b2, wg, bg)


def _gated_pair_bwd(num_heads, scale, mode, res, g):
    """Recompute the pair output with the fused pair kernel, backprop the
    (cheap) gate in XLA, then chain the pair backward."""
    (x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2, wg, bg) = res
    out = _pair_pallas(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                       ln2_b, w1, b1, w2, b2, num_heads, scale, mode)
    _, gate_vjp = jax.vjp(_gate_xla, other, out, wg, bg)
    d_other, d_out, d_wg, d_bg = gate_vjp(g)
    pair_grads = _pair_bwd(num_heads, scale, mode,
                           (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                            ln2_s, ln2_b, w1, b1, w2, b2), d_out)
    return (pair_grads[0], d_other, *pair_grads[1:], d_wg, d_bg)


fused_gated_pair_block.defvjp(_gated_pair_fwd, _gated_pair_bwd)
