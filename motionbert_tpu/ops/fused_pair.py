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
    _attn_rows_flat, _dot, _flat_valid, _fused_block_xla, _ln_bwd_rows,
    _ln_fwd_stats, _ln_rows, _on_tpu, _spatial_masks, _vmem_params)
from motionbert_tpu.ops.fused_mlp import _erf, _fused_mlp_xla

# Spatial frame-tile for the FORWARD pair kernels: tf frames of J joints
# per token tile (block-diagonal same-frame mask). Pallas TPU requires the
# block's second-to-last dim to be divisible by 8, and J=17 is odd, so tf
# must itself be a multiple of 8 — tf=8 (N=136) is the minimum and the
# measured optimum. The tempting tf=7 (N=119 <= 128: single-MXU-tile
# score/AV matmuls, ~3.5x less score-core tile work) is REJECTED at
# lowering ("block shape ... divisible by 8", measured r3); buying it
# back would need a padded (g, 128, C) token relayout whose extra HBM
# round-trip costs more than the ~11%-of-forward MXU saving.
SPATIAL_TF = 8

# Spatial frame-tile for the pair BACKWARD kernels (separate knob: the
# backward's VMEM scratch and DMA-overlap profile differ from the
# forward's). Same divisible-by-8 lowering constraint as SPATIAL_TF.
SPATIAL_TF_BWD = 8


def _pair_rows(xb, bb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref,
               wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref,
               ln2_b_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    """bb stacked token groups ((bb*N, C) rows) through attention sub-block
    + MLP sub-block; returns the (bb*N, C) output in the compute dtype.

    All projection/MLP matmuls run on the full flattened row block — one
    (bb*N, C) matmul keeps the MXU pipeline fed where bb separate (N, C)
    ones each stall it (N=136/243 at flagship dims); only the softmax(QK^T)V
    core stays per-(group, head), since groups must not attend across."""
    dtype = xb.dtype
    # --- attention sub-block ---
    h = _ln_rows(xb, ln1_s_ref[0], ln1_b_ref[0]).astype(dtype)
    qkv = _dot(h, wqkv_ref[:]) + bqkv_ref[0]            # (bb*N, 3C) f32
    attn = _attn_rows_flat(qkv, bb, num_heads, scale, same_mask, dtype)
    y = _dot(attn, wproj_ref[:]) + bproj_ref[0] \
        + xb.astype(jnp.float32)                        # (bb*N, C) f32
    # exact parity with the two-kernel composition: the standalone MLP
    # kernel reads y from HBM in the compute dtype
    yb = y.astype(dtype)
    # --- MLP sub-block ---
    h2 = _ln_rows(yb, ln2_s_ref[0], ln2_b_ref[0]).astype(dtype)
    z = _dot(h2, w1_ref[:]) + b1_ref[0]                 # (bb*N, hidden) f32
    z = 0.5 * z * (1.0 + _erf(z * np.float32(0.7071067811865476)))
    out = _dot(z.astype(dtype), w2_ref[:]) + b2_ref[0] \
        + yb.astype(jnp.float32)
    return out.astype(dtype)


def _read_flat(x_ref, bb, row_valid_flat):
    """(bb, N, C) block -> (bb*N, C) rows, zeroing invalid (padding) rows."""
    bb_, N, C = x_ref.shape
    x = x_ref[:].reshape(bb * N, C)
    if row_valid_flat is not None:
        x = jnp.where(row_valid_flat, x, 0)
    return x


def _pair_kernel(num_heads, scale, bb, num_joints, total_tokens, mode,
                 x_ref, ln1_s_ref, ln1_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref):
    N = x_ref.shape[1]
    row_valid, same_mask = (None, None) if mode != "spatial" else \
        _spatial_masks(N, num_joints, total_tokens)
    rv = _flat_valid(row_valid, bb)
    xb = _read_flat(x_ref, bb, rv)
    out = _pair_rows(
        xb, bb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref, wqkv_ref,
        bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref,
        b1_ref, w2_ref, b2_ref)
    o_ref[:] = out.reshape(x_ref.shape).astype(o_ref.dtype)


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
    rv = _flat_valid(row_valid, bb)
    xb = _read_flat(x_ref, bb, rv)
    out = _pair_rows(
        xb, bb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref, wqkv_ref,
        bqkv_ref, wproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref,
        b1_ref, w2_ref, b2_ref)
    other = _read_flat(other_ref, bb, None)
    o_ref[:] = _gate_rows(other, out, wga_ref, wgb_ref, bg_ref).reshape(
        o_ref.shape).astype(o_ref.dtype)


def _gate_rows(other, out, wga_ref, wgb_ref, bg_ref):
    """att_fuse softmax-gate epilogue over flattened (bb*N, C) rows —
    the single in-kernel implementation, shared by the bf16 and q8 gated
    pair kernels (the standalone reference is _gate_xla below): per-channel
    2-way softmax mix of the two stream outputs (DSTformer.py:340-351)."""
    s = (_dot(other, wga_ref[:]) + _dot(out, wgb_ref[:])
         + bg_ref[0].astype(jnp.float32))               # (bb*N, 2) f32
    s0, s1 = s[:, 0:1], s[:, 1:2]
    m = jnp.maximum(s0, s1)
    e0 = jnp.exp(s0 - m)
    e1 = jnp.exp(s1 - m)
    inv = 1.0 / (e0 + e1)
    a0 = (e0 * inv).astype(out.dtype)
    a1 = (e1 * inv).astype(out.dtype)
    return other * a0 + out * a1


def _pick_pair_batch_block(B, N, C, hidden, itemsize, gated: bool = False,
                           budget: int = 26 << 20) -> int:
    """Largest divisor of B whose per-b f32 intermediates (qkv + hidden +
    attn/y) fit the VMEM budget alongside the resident weights. The gated
    variant streams a second (N, C) input per b plus small f32 gate
    temporaries.

    budget 26MB (forward launches only; the pair backward sizes its own
    blocks): at flagship dims this lifts temporal bb 2 -> 4, measured +4%
    kernel throughput (r3 probe), and still compiles under the 28MB
    compiler_params limit. The backward keeps smaller blocks — bb=4/8
    measured ~8% slower there (DMA overlap starvation, docs/design.md)."""
    weights = (3 * C * C + C * C + 2 * C * hidden) * itemsize
    per_b = N * (3 * C + hidden + 3 * C) * 4 + 4 * N * C * itemsize
    if gated:
        per_b += N * C * itemsize + 6 * N * 4
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
        tf = SPATIAL_TF
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
        # the picker budgets 26MB; raise Mosaic's 16MB default scoped-VMEM
        # limit so an estimate landing in 16-28MB compiles instead of
        # erroring (28MB budgets compile on this chip, CLAUDE.md)
        compiler_params=_vmem_params(28 << 20),
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


# ---------------------------------------------------------------------------
# Fused pair BACKWARD kernel
#
# One kernel per (batch-block, token-tile) program computes the ENTIRE pair
# gradient: recompute attention forward (once — its qkv and probabilities
# are stashed in VMEM scratch and reused by the attention backward, where
# the two-kernel composition recomputed them a second time), MLP backward,
# attention backward, emitting dx plus all 12 weight/bias/LN gradients
# through constant-index accumulating output blocks. The intermediate y / dy
# never touch HBM. The gated variant additionally recomputes the MLP output
# and backprops the att_fuse gate in the same program (d_other + gate-weight
# grads), eliminating the separate full-pair recompute the XLA gate vjp
# needed. Numerics keep the two-kernel composition's rounding points
# (y and dy round to the compute dtype at the sub-block boundary).
# ---------------------------------------------------------------------------

def _dot_t(a, b):
    """a @ b^T with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_at(a, b):
    """a^T @ b with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pair_bwd_body(bb, num_heads, scale, same_mask, row_valid, gated,
                   x_ref, other_ref, g_ref,
                   ln1_s_ref, ln1_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                   bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, wga_ref, wgb_ref, bg_ref,
                   dx_ref, dother_ref, dls1_ref, dlb1_ref, dwqkv_ref,
                   dbqkv_ref, dwproj_ref, dbproj_ref, dls2_ref, dlb2_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref, dwga_ref, dwgb_ref,
                   dbg_ref, qkv_scr, dqkv_scr, attn_scr, p_scr):
    """Whole-block pair backward on (bb*N, C) flattened rows: every
    projection/MLP/weight-grad matmul runs once on the full row block (the
    MXU-utilization lever — see _pair_rows); only softmax(QK^T)V and its
    gradient loop per (group, head)."""
    N = x_ref.shape[1]
    C = x_ref.shape[-1]
    d = C // num_heads
    rv = _flat_valid(row_valid, bb)
    xb = _read_flat(x_ref, bb, rv)
    gb = _read_flat(g_ref, bb, rv)
    dtype = xb.dtype

    # ---- attention sub-block forward recompute (qkv/p/attn kept in VMEM
    # scratch for the backward passes below) ----
    xhat1, rstd1, h1f = _ln_fwd_stats(xb, ln1_s_ref, ln1_b_ref)
    h1 = h1f.astype(dtype)
    qkv_scr[:] = _dot(h1, wqkv_ref[:]) + bqkv_ref[0]         # (bb*N, 3C) f32
    for b in range(bb):
        rows = slice(b * N, (b + 1) * N)
        for h in range(num_heads):
            qs = slice(h * d, (h + 1) * d)
            ks = slice(C + h * d, C + (h + 1) * d)
            vs = slice(2 * C + h * d, 2 * C + (h + 1) * d)
            q = qkv_scr[rows, qs].astype(dtype)
            k = qkv_scr[rows, ks].astype(dtype)
            v = qkv_scr[rows, vs].astype(dtype)
            s = _dot_t(q, k) * scale
            if same_mask is not None:
                s = jnp.where(same_mask, s, jnp.float32(-1e30))
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)       # (N, N) f32
            p_scr[b * num_heads + h] = p
            attn_scr[rows, qs] = _dot(p.astype(dtype), v).astype(dtype)
    yf = _dot(attn_scr[:], wproj_ref[:]) + bproj_ref[0] \
        + xb.astype(jnp.float32)
    yb = yf.astype(dtype)  # the sub-block boundary rounding (parity)

    # ---- MLP forward recompute ----
    xhat2, rstd2, h2f = _ln_fwd_stats(yb, ln2_s_ref, ln2_b_ref)
    h2 = h2f.astype(dtype)
    z = _dot(h2, w1_ref[:]) + b1_ref[0]                  # (bb*N, hidden) f32
    inv_sqrt2 = np.float32(0.7071067811865476)
    cdf = 0.5 * (1.0 + _erf(z * inv_sqrt2))
    a = (z * cdf).astype(dtype)

    if gated:
        # pair output + att_fuse gate backward (reference DSTformer.py:
        # 340-351). Mask `other` too: garbage edge rows otherwise poison
        # the accumulated gate-weight grads through exp/NaN.
        otherb = _read_flat(other_ref, bb, rv)
        out_b = (_dot(a, w2_ref[:]) + b2_ref[0]
                 + yb.astype(jnp.float32)).astype(dtype)
        sg = (_dot(otherb, wga_ref[:]) + _dot(out_b, wgb_ref[:])
              + bg_ref[0].astype(jnp.float32))           # (bb*N, 2) f32
        m = jnp.max(sg, axis=-1, keepdims=True)
        e = jnp.exp(sg - m)
        alpha = e / jnp.sum(e, axis=-1, keepdims=True)   # (bb*N, 2) f32
        ga = gb.astype(jnp.float32)
        dal0 = jnp.sum(ga * otherb.astype(jnp.float32), axis=-1,
                       keepdims=True)
        dal1 = jnp.sum(ga * out_b.astype(jnp.float32), axis=-1,
                       keepdims=True)
        dal = jnp.concatenate([dal0, dal1], axis=-1)     # (bb*N, 2)
        dsg = alpha * (dal - jnp.sum(dal * alpha, axis=-1, keepdims=True))
        dsgb = dsg.astype(dtype)
        dother = ga * alpha[:, 0:1] + _dot_t(dsgb, wga_ref[:])
        dout = ga * alpha[:, 1:2] + _dot_t(dsgb, wgb_ref[:])
        dwga_ref[:] += _dot_at(otherb, dsgb)
        dwgb_ref[:] += _dot_at(out_b, dsgb)
        dbg_ref[0] += jnp.sum(dsg, axis=0)
        dother_ref[:] = dother.reshape(dother_ref.shape).astype(dtype)
        gmlp = dout.astype(dtype)                        # grad into pair
    else:
        gmlp = gb

    # ---- MLP backward ----
    dw2_ref[:] += _dot_at(a, gmlp)
    db2_ref[0] += jnp.sum(gmlp.astype(jnp.float32), axis=0)
    da = _dot_t(gmlp, w2_ref[:].astype(dtype))           # (bb*N, hidden) f32
    pdf = jnp.exp(-0.5 * z * z) * np.float32(0.3989422804014327)
    dz = (da * (cdf + z * pdf)).astype(dtype)
    dw1_ref[:] += _dot_at(h2, dz)
    db1_ref[0] += jnp.sum(dz.astype(jnp.float32), axis=0)
    dh2 = _dot_t(dz, w1_ref[:].astype(dtype))            # (bb*N, C) f32
    dy = _ln_bwd_rows(dh2, xhat2, rstd2, ln2_s_ref, dls2_ref, dlb2_ref) \
        + gmlp.astype(jnp.float32)                       # +residual
    dyb = dy.astype(dtype)  # the sub-block boundary rounding (parity)

    # ---- attention backward (reuses qkv_scr / p_scr / attn_scr) ----
    dattn = _dot_t(dyb, wproj_ref[:].astype(dtype))      # (bb*N, C) f32
    dbproj_ref[0] += jnp.sum(dyb.astype(jnp.float32), axis=0)
    dwproj_ref[:] += _dot_at(attn_scr[:], dyb)
    for b in range(bb):
        rows = slice(b * N, (b + 1) * N)
        for h in range(num_heads):
            qs = slice(h * d, (h + 1) * d)
            ks = slice(C + h * d, C + (h + 1) * d)
            vs = slice(2 * C + h * d, 2 * C + (h + 1) * d)
            q = qkv_scr[rows, qs].astype(dtype)
            k = qkv_scr[rows, ks].astype(dtype)
            v = qkv_scr[rows, vs].astype(dtype)
            p = p_scr[b * num_heads + h]                 # (N, N) f32
            pb = p.astype(dtype)
            dah = dattn[rows, qs].astype(dtype)          # (N, d)
            dv = _dot_at(pb, dah)
            dp = _dot_t(dah, v)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(dtype)
            dq = _dot(ds, k)
            dk = _dot_at(ds, q)
            dqkv_scr[rows, qs] = dq
            dqkv_scr[rows, ks] = dk
            dqkv_scr[rows, vs] = dv
    dqkv = dqkv_scr[:].astype(dtype)
    dwqkv_ref[:] += _dot_at(h1, dqkv)
    dbqkv_ref[0] += jnp.sum(dqkv_scr[:], axis=0)
    dh1 = _dot_t(dqkv, wqkv_ref[:].astype(dtype))        # (bb*N, C) f32
    dx = _ln_bwd_rows(dh1, xhat1, rstd1, ln1_s_ref, dls1_ref, dlb1_ref) \
        + dyb.astype(jnp.float32)                        # +residual
    dx_ref[:] = dx.reshape(dx_ref.shape).astype(dtype)


def _pair_bwd_kernel(num_heads, scale, bb, num_joints, total_tokens, mode,
                     gated, *refs):
    from jax.experimental import pallas as pl

    x_ref = refs[0]
    N = x_ref.shape[1]
    row_valid, same_mask = (None, None) if mode != "spatial" else \
        _spatial_masks(N, num_joints, total_tokens)

    if gated:
        ins, outs = refs[:18], refs[18:35]
        scr = refs[35:]
        (x_ref, other_ref, g_ref, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
         ln2_s, ln2_b, w1, b1, w2, b2, wga, wgb, bg) = ins
        (dx, dother, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2, dlb2,
         dw1, db1, dw2, db2, dwga, dwgb, dbg) = outs
    else:
        ins, outs = refs[:14], refs[14:27]
        scr = refs[27:]
        (x_ref, g_ref, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
         ln2_s, ln2_b, w1, b1, w2, b2) = ins
        other_ref = None
        (dx, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2, dlb2,
         dw1, db1, dw2, db2) = outs
        dother = dwga = dwgb = dbg = None
        wga = wgb = bg = None
    qkv_scr, dqkv_scr, attn_scr, p_scr = scr

    grad_refs = [r for r in (dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2,
                             dlb2, dw1, db1, dw2, db2, dwga, dwgb, dbg)
                 if r is not None]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    _pair_bwd_body(
        bb, num_heads, scale, same_mask, row_valid, gated,
        x_ref, other_ref, g_ref,
        ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1,
        w2, b2, wga, wgb, bg,
        dx, dother, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2,
        dlb2, dw1, db1, dw2, db2, dwga, dwgb, dbg,
        qkv_scr, dqkv_scr, attn_scr, p_scr)


def _pick_pair_bwd_batch_block(B, N, C, hidden, num_heads, itemsize, gated,
                               budget: int = 26 << 20) -> int:
    """Largest measured-good divisor of B fitting: resident weights (bf16) +
    f32 grad accumulators + bb-scaled scratch (the flattened kernel's
    qkv/dqkv/p/attn scratches grow with bb) + bb double-buffered streams.
    Capped at bb=2: bigger blocks leave too few grid steps to overlap the
    stream DMAs (measured round 2), and the flattened scratches put bb=4
    past the physical-VMEM wall anyway.

    The 26 MB budget's bb=1 for the GATED TEMPORAL backward (its bb=2
    scratch estimate is 27.8 MB) is measured-correct, not a budget
    artifact: forcing bb=2 via a raised budget ran 102.2 ms vs bb=1's
    88.5 ms at flagship dims (round-4 probe_pair, reproduced twice each) —
    same DMA-overlap starvation as bb=4/8 on the forward."""
    weights = (3 * C * C + C * C + 2 * C * hidden) * itemsize
    grads = (3 * C * C + C * C + 2 * C * hidden) * 4
    scratch_per_b = N * (3 * C + 3 * C) * 4 + N * C * itemsize \
        + num_heads * N * N * 4
    streams_per_b = (5 if gated else 3) * N * C * itemsize * 2
    fixed = weights + grads
    for bb in (2, 1):
        if B % bb == 0 and \
                fixed + bb * (scratch_per_b + streams_per_b) <= budget:
            return bb
    return 1


def _pair_bwd_pallas(x, other, g, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                     ln2_s, ln2_b, w1, b1, w2, b2, wg, bg, num_heads, scale,
                     mode):
    """Launch the fused pair backward. other/wg/bg of None -> plain pair."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gated = other is not None
    B, F, J, C = x.shape
    hidden = w1.shape[1]
    dtype = x.dtype
    bb = _pick_pair_bwd_batch_block(
        B, F if mode == "temporal" else SPATIAL_TF_BWD * J,
        C, hidden, num_heads, dtype.itemsize, gated)
    if mode == "temporal":
        N, total = F, None
        reshape = (B, F, J * C)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
    else:
        tf = SPATIAL_TF_BWD
        N, total = tf * J, F * J
        reshape = (B, F * J, C)
        x_spec = pl.BlockSpec((bb, N, C), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, (F + tf - 1) // tf)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    w_shapes = [((1, C), ln1_s), ((1, C), ln1_b), (wqkv.shape, wqkv),
                ((1, 3 * C), bqkv), (wproj.shape, wproj), ((1, C), bproj),
                ((1, C), ln2_s), ((1, C), ln2_b), (w1.shape, w1),
                ((1, hidden), b1), (w2.shape, w2), ((1, C), b2)]

    in_specs = [x_spec] + ([x_spec] if gated else []) + [x_spec] \
        + [const(s) for s, _ in w_shapes]
    inputs = [x.reshape(reshape)] \
        + ([other.reshape(reshape)] if gated else []) + [g.reshape(reshape)] \
        + [arr.reshape(s) if arr.ndim == 1 else arr for s, arr in w_shapes]
    if gated:
        in_specs += [const((C, 2)), const((C, 2)), const((1, 2))]
        inputs += [wg[:C], wg[C:], bg.reshape(1, -1)]

    grad_outs = [
        (const((1, C)), (1, C), f32),          # dls1
        (const((1, C)), (1, C), f32),          # dlb1
        (const(wqkv.shape), wqkv.shape, f32),  # dwqkv
        (const((1, 3 * C)), (1, 3 * C), f32),  # dbqkv
        (const(wproj.shape), wproj.shape, f32),
        (const((1, C)), (1, C), f32),          # dbproj
        (const((1, C)), (1, C), f32),          # dls2
        (const((1, C)), (1, C), f32),          # dlb2
        (const(w1.shape), w1.shape, f32),
        (const((1, hidden)), (1, hidden), f32),
        (const(w2.shape), w2.shape, f32),
        (const((1, C)), (1, C), f32),          # db2
    ]
    out_specs = [x_spec] + ([x_spec] if gated else [])
    out_shapes = [jax.ShapeDtypeStruct(reshape, dtype)] \
        + ([jax.ShapeDtypeStruct(reshape, dtype)] if gated else [])
    out_specs += [s for s, _, _ in grad_outs]
    out_shapes += [jax.ShapeDtypeStruct(sh, dt) for _, sh, dt in grad_outs]
    if gated:
        out_specs += [const((C, 2)), const((C, 2)), const((1, 2))]
        out_shapes += [jax.ShapeDtypeStruct((C, 2), f32),
                       jax.ShapeDtypeStruct((C, 2), f32),
                       jax.ShapeDtypeStruct((1, 2), f32)]

    outs = pl.pallas_call(
        functools.partial(_pair_bwd_kernel, num_heads, scale, bb, J, total,
                          mode, gated),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((bb * N, 3 * C), f32),          # qkv
            pltpu.VMEM((bb * N, 3 * C), f32),          # dqkv
            pltpu.VMEM((bb * N, C), dtype),            # attn
            pltpu.VMEM((bb * num_heads, N, N), f32),   # p
        ],
        compiler_params=_vmem_params(48 << 20),
        interpret=not _on_tpu(),
    )(*inputs)

    if gated:
        (dx, dother, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2, dlb2,
         dw1, db1, dw2, db2, dwga, dwgb, dbg) = outs
    else:
        (dx, dls1, dlb1, dwqkv, dbqkv, dwproj, dbproj, dls2, dlb2,
         dw1, db1, dw2, db2) = outs
    B4 = (B, F, J, C)
    grads = dict(
        dx=dx.reshape(B4).astype(dtype),
        dls1=dls1[0].astype(ln1_s.dtype), dlb1=dlb1[0].astype(ln1_b.dtype),
        dwqkv=dwqkv.astype(wqkv.dtype), dbqkv=dbqkv[0].astype(bqkv.dtype),
        dwproj=dwproj.astype(wproj.dtype),
        dbproj=dbproj[0].astype(bproj.dtype),
        dls2=dls2[0].astype(ln2_s.dtype), dlb2=dlb2[0].astype(ln2_b.dtype),
        dw1=dw1.astype(w1.dtype), db1=db1[0].astype(b1.dtype),
        dw2=dw2.astype(w2.dtype), db2=db2[0].astype(b2.dtype))
    if gated:
        grads["dother"] = dother.reshape(B4).astype(dtype)
        grads["dwg"] = jnp.concatenate(
            [dwga, dwgb], axis=0).astype(wg.dtype)
        grads["dbg"] = dbg[0].astype(bg.dtype)
    return grads


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
    """Single fused backward kernel for the whole pair (see
    _pair_bwd_pallas): qkv/attention recomputed once, y/dy never leave
    VMEM."""
    (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2) = res
    gr = _pair_bwd_pallas(x, None, g, ln1_s, ln1_b, wqkv, bqkv, wproj,
                          bproj, ln2_s, ln2_b, w1, b1, w2, b2, None, None,
                          num_heads, scale, mode)
    return (gr["dx"], gr["dls1"], gr["dlb1"], gr["dwqkv"], gr["dbqkv"],
            gr["dwproj"], gr["dbproj"], gr["dls2"], gr["dlb2"],
            gr["dw1"], gr["db1"], gr["dw2"], gr["db2"])


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
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize,
                                    gated=True)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
    else:
        tf = SPATIAL_TF
        N, total = tf * J, F * J
        reshape = (B, F * J, C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize,
                                    gated=True)
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
        compiler_params=_vmem_params(28 << 20),
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
    """Single fused backward kernel: gate vjp + pair backward in one
    program; the pair output is recomputed in VMEM, never in HBM."""
    (x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2, wg, bg) = res
    gr = _pair_bwd_pallas(x, other, g, ln1_s, ln1_b, wqkv, bqkv, wproj,
                          bproj, ln2_s, ln2_b, w1, b1, w2, b2, wg, bg,
                          num_heads, scale, mode)
    return (gr["dx"], gr["dother"], gr["dls1"], gr["dlb1"], gr["dwqkv"],
            gr["dbqkv"], gr["dwproj"], gr["dbproj"], gr["dls2"], gr["dlb2"],
            gr["dw1"], gr["db1"], gr["dw2"], gr["db2"], gr["dwg"],
            gr["dbg"])


fused_gated_pair_block.defvjp(_gated_pair_fwd, _gated_pair_bwd)
