"""Spatio-temporal attention cores, TPU-fused.

DSTformer attends alternately over the joint axis ("spatial", J=17 tokens)
and the frame axis ("temporal", F<=243 tokens) of a (B, F, J, C) stream
(behavior parity: /root/reference/lib/model/DSTformer.py:178-200). Both are
tiny-token attentions: the FLOPs are negligible next to the qkv/proj/MLP
matmuls, but a naive einsum formulation is catastrophic on TPU — J=17 lands
in tiled dims (up to 10.6x padding on the score tensor) and every attention
costs two full HBM relayout round-trips. Measured on v5e, XLA-einsum
attention consumed ~60% of model runtime for ~6% of FLOPs.

The Pallas kernels below read q/k/v in their natural (B, F, J, C) layout
(C contiguous in lanes), keep scores entirely in VMEM, and write the output
back in the same layout — no HBM score materialization, no relayouts:

- temporal: grid (B, J); each program computes per-head softmax(QK^T)V over
  the (F, d) slices of all H heads.
- spatial: grid (B, F/TF); frames are tiled TF at a time and the J=17
  within-frame attention is computed as one (TF*J, TF*J) MXU matmul with a
  block-diagonal frame mask — trading ~TF-fold redundant score FLOPs
  (still < 5% of model FLOPs) for full MXU tiles.

Both are wrapped in jax.custom_vjp: forward = Pallas, backward = the
analytic attention gradient as plain einsums (XLA), with q/k/v recomputed
activations as residuals. Off-TPU the kernels run in interpreter mode, so
tests exercise identical code paths on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# XLA reference formulation (also the backward path of the fused kernels)
# ---------------------------------------------------------------------------

def _split_heads(x, num_heads):
    """(B, F, J, C) -> (B, F, J, H, d)."""
    B, F, J, C = x.shape
    return x.reshape(B, F, J, num_heads, C // num_heads)


def _merge_heads(x):
    B, F, J, H, d = x.shape
    return x.reshape(B, F, J, H * d)


def _sdpa(q, k, v, scale):
    """softmax(q k^T * scale) v over the second-to-last axis; fp32 softmax."""
    attn = jnp.einsum("...nd,...md->...nm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...nm,...md->...nd", attn, v)


def _attention_xla(q, k, v, num_heads, scale, mode):
    q, k, v = (_split_heads(x, num_heads) for x in (q, k, v))
    if mode == "spatial":
        perm, inv = "bfjhd->bfhjd", "bfhjd->bfjhd"
    else:
        perm, inv = "bfjhd->bjhfd", "bjhfd->bfjhd"
    out = _sdpa(jnp.einsum(perm, q), jnp.einsum(perm, k),
                jnp.einsum(perm, v), scale)
    return _merge_heads(jnp.einsum(inv, out))


def _attention_xla_spatial_grouped(q, k, v, num_heads, scale, tf: int = 8):
    """Spatial attention as grouped block-diagonal masked attention in XLA.

    Mathematically identical to per-frame softmax (masked cols underflow to
    exactly 0), but the score tensor is (B, F/tf, H, tf*J, tf*J) — ~1.9x TPU
    tile padding instead of the 10.6x of the per-frame (..., 17, 17) layout.
    Used on the backward path of the fused kernels, where the naive layout
    OOMs HBM at training batch sizes.
    """
    B, F, J, C = q.shape
    H = num_heads
    d = C // H
    Fp = ((F + tf - 1) // tf) * tf
    pad = Fp - F
    if pad:
        padw = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, padw) for x in (q, k, v))
    G, N = Fp // tf, tf * J

    def to_groups(x):  # (B, Fp, J, C) -> (B, G, H, N, d)
        x = x.reshape(B, G, N, H, d)
        return jnp.einsum("bgnhd->bghnd", x)

    qg, kg, vg = (to_groups(x) for x in (q, k, v))
    row_f = np.arange(N) // J
    mask = (row_f[:, None] == row_f[None, :])
    s = jnp.einsum("bghnd,bghmd->bghnm", qg, kg) * scale
    s = jnp.where(mask, s.astype(jnp.float32), -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(qg.dtype)
    out = jnp.einsum("bghnm,bghmd->bghnd", p, vg)
    out = jnp.einsum("bghnd->bgnhd", out).reshape(B, Fp, J, C)
    return out[:, :F]


# ---------------------------------------------------------------------------
# Fused Pallas kernels
# ---------------------------------------------------------------------------

def _temporal_kernel(num_heads, scale, bb, q_ref, k_ref, v_ref, o_ref):
    """One (batch-block, j) slice: per-head attention over F frames for bb
    batch elements (batched per program to amortize grid overhead)."""
    C = q_ref.shape[-1]
    d = C // num_heads
    for b in range(bb):
        qb = q_ref[b]  # (F, C)
        kb = k_ref[b]
        vb = v_ref[b]
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(
                qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[b, :, sl] = jax.lax.dot_general(
                p.astype(qb.dtype), vb[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pick_batch_block(B: int, per_b_bytes: int, budget: int = 6 << 20) -> int:
    """Largest divisor of B (<=8) whose 4 buffers fit the VMEM budget."""
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and bb * per_b_bytes * 4 <= budget:
            return bb
    return 1


def _vmem_params(limit_bytes: int):
    """Mosaic compiler params raising the scoped-VMEM limit (the 16MB
    default rejects the batched backward kernels; the physical VMEM on this
    chip comfortably fits ~28MB frames, CLAUDE.md)."""
    from jax.experimental.pallas import tpu as pltpu

    cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
    return cp(vmem_limit_bytes=limit_bytes)


def _pick_bwd_batch_block(B: int, N: int, C: int, itemsize: int) -> int:
    """Batch block for the standalone attention backward kernel. Measured
    on the dev chip at flagship dims: bb=4 runs ~7% SLOWER than bb=1
    (18.2 vs 17.0 ms spatial — fewer grid steps to overlap DMA against),
    so one batch element per program stays the configuration. The kernel
    itself is bb-generic; the fused pair backward (ops.fused_pair) is where
    batching pays, because its per-program compute is ~3x larger."""
    return 1


def _temporal_pallas(q, k, v, num_heads, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, J, C = q.shape
    # View as (B, F, J*C) — a free reshape — and block the fused (J*C) axis
    # at stride C: block (bb, F, C) indexed by (b, j) covers the
    # q[b*bb:(b+1)*bb, :, j, :] slices, strided-DMA'd straight out of the
    # natural layout. No relayout transposes; F and C satisfy the
    # last-two-dims tiling rule.
    bb = _pick_batch_block(B, F * C * q.dtype.itemsize)
    q3, k3, v3 = (x.reshape(B, F, J * C) for x in (q, k, v))
    spec = pl.BlockSpec((bb, F, C), lambda b, j: (b, 0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_temporal_kernel, num_heads, scale, bb),
        grid=(B // bb, J),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, F, J * C), q.dtype),
        interpret=not _on_tpu(),
    )(q3, k3, v3)
    return out.reshape(B, F, J, C)


def _spatial_kernel(num_heads, scale, num_joints, total_tokens, bb,
                    q_ref, k_ref, v_ref, o_ref):
    """One (batch-block, frame-tile) slice: within-frame attention over J
    joints, batched as a single (tf*J, tf*J) masked matmul per head and
    unrolled over bb batch elements per program. Token rows are the
    flattened (frame, joint) pairs, so everything stays 2-D in VMEM."""
    from jax.experimental import pallas as pl

    TJ = q_ref.shape[1]
    C = q_ref.shape[-1]
    d = C // num_heads
    # Partial edge block: rows beyond the array are undefined. Zero v there
    # (0-weight x NaN would still be NaN in the output contraction); q/k
    # garbage is neutralized by the select below and by dropped stores.
    # block-diagonal frame mask: token i attends to token m iff same frame
    row_valid, same_frame = _spatial_masks(TJ, num_joints, total_tokens)
    for b in range(bb):
        qb = q_ref[b]  # (TF*J, C)
        kb = k_ref[b]
        vb = jnp.where(row_valid, v_ref[b], 0)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(
                qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(same_frame, s, jnp.float32(-1e30))
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[b, :, sl] = jax.lax.dot_general(
                p.astype(qb.dtype), vb[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _spatial_pallas(q, k, v, num_heads, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, J, C = q.shape
    # collapse (F, J) -> tokens: adjacent contiguous dims, no relayout.
    # Token blocks are 8 frames (8*J rows, sublane-aligned for J=17 since
    # 136 % 8 == 0); every block starts at a frame boundary, so the local
    # block-diagonal mask is exact. A partial edge block reads padding rows
    # whose stores Pallas drops; the mask keeps them out of real rows'
    # softmax (padding cols belong to frames >= the real rows' frames).
    tf = 8  # 8 frames/tile: tf*J is sublane-aligned for any J (8*J % 8 == 0)
    bb = _pick_batch_block(B, tf * J * C * q.dtype.itemsize)
    q2, k2, v2 = (x.reshape(B, F * J, C) for x in (q, k, v))
    spec = pl.BlockSpec((bb, tf * J, C), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    grid = (B // bb, (F + tf - 1) // tf)
    out = pl.pallas_call(
        functools.partial(_spatial_kernel, num_heads, scale, J, F * J, bb),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, F * J, C), q.dtype),
        interpret=not _on_tpu(),
    )(q2, k2, v2)
    return out.reshape(B, F, J, C)


# ---------------------------------------------------------------------------
# custom_vjp wrappers: Pallas forward, analytic XLA backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_fused(q, k, v, num_heads, scale, mode):
    if mode == "spatial":
        return _spatial_pallas(q, k, v, num_heads, scale)
    return _temporal_pallas(q, k, v, num_heads, scale)


def _attention_fused_fwd(q, k, v, num_heads, scale, mode):
    return _attention_fused(q, k, v, num_heads, scale, mode), (q, k, v)


def _attention_fused_bwd(num_heads, scale, mode, res, g):
    """Analytic attention gradient, recomputing P (einsum/XLA path)."""
    q, k, v = res
    if mode == "spatial":
        # grouped layout: ~1.9x score padding instead of 10.6x (HBM)
        _, vjp = jax.vjp(
            lambda q, k, v: _attention_xla_spatial_grouped(
                q, k, v, num_heads, scale), q, k, v)
        return vjp(g)
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    gh = _split_heads(g, num_heads)
    perm, inv = "bfjhd->bjhfd", "bjhfd->bfjhd"  # temporal (spatial returned)
    qt, kt, vt, gt = (jnp.einsum(perm, x) for x in (qh, kh, vh, gh))

    s = jnp.einsum("...nd,...md->...nm", qt, kt) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    dv = jnp.einsum("...nm,...nd->...md", p.astype(gt.dtype), gt)
    dp = jnp.einsum("...nd,...md->...nm", gt, vt).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(qt.dtype)
    dq = jnp.einsum("...nm,...md->...nd", ds, kt)
    dk = jnp.einsum("...nm,...nd->...md", ds, qt)
    dq, dk, dv = (jnp.einsum(inv, x) for x in (dq, dk, dv))
    return (_merge_heads(dq), _merge_heads(dk), _merge_heads(dv))


_attention_fused.defvjp(_attention_fused_fwd, _attention_fused_bwd)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

def st_attention(q, k, v, mode: str, num_heads: int, scale: float,
                 impl: str = "pallas"):
    """Dual-axis attention on (B, F, J, C) tensors; returns same shape.

    mode="spatial": tokens are the J joints of one frame. mode="temporal":
    tokens are the F frames of one joint. impl="pallas" uses the fused VMEM
    kernels (interpreted off-TPU); impl="xla" uses the einsum formulation.
    """
    if mode not in ("spatial", "temporal"):
        raise ValueError(f"unknown st_attention mode: {mode}")
    if impl == "xla" or q.shape[-1] % 128 != 0:
        # Pallas blocks need the channel dim lane-aligned; small models
        # (tests, Lite variants with C<128) take the XLA path
        return _attention_xla(q, k, v, num_heads, scale, mode)
    return _attention_fused(q, k, v, num_heads, scale, mode)


# ---------------------------------------------------------------------------
# Fully fused attention block: qkv matmul -> attention -> output projection
# in one kernel. Cuts the attention sub-block's HBM traffic ~5x (the qkv and
# pre-projection activations never leave VMEM); weight blocks use constant
# index maps so Pallas keeps them VMEM-resident across the whole grid.
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_rows(qkv, num_heads, scale, same_mask, out_dtype):
    """qkv: (N, 3C) f32 rows of one token group -> attention output (N, C)."""
    N, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * d:(h + 1) * d].astype(out_dtype)
        k = qkv[:, C + h * d:C + (h + 1) * d].astype(out_dtype)
        v = qkv[:, 2 * C + h * d:2 * C + (h + 1) * d].astype(out_dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if same_mask is not None:
            s = jnp.where(same_mask, s, jnp.float32(-1e30))
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(_dot(p.astype(out_dtype), v).astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)  # (N, C)


def _attn_rows_flat(qkv, bb, num_heads, scale, same_mask, out_dtype):
    """Batch-flattened attention core: qkv is (bb*N, 3C) f32 rows of bb
    independent token groups stacked along rows. The softmax(QK^T)V core
    stays per-(group, head) — groups must not attend across each other —
    but the caller's projection matmuls run on the full (bb*N, C) row block,
    which is the MXU-utilization lever: (N, C) matmuls at N=136/243 starve
    the systolic array's pipeline, (bb*N, C) ones keep it fed."""
    BN, C3 = qkv.shape
    N = BN // bb
    C = C3 // 3
    d = C // num_heads
    per_b = []
    for b in range(bb):
        rows = slice(b * N, (b + 1) * N)
        outs = []
        for h in range(num_heads):
            q = qkv[rows, h * d:(h + 1) * d].astype(out_dtype)
            k = qkv[rows, C + h * d:C + (h + 1) * d].astype(out_dtype)
            v = qkv[rows, 2 * C + h * d:2 * C + (h + 1) * d].astype(out_dtype)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if same_mask is not None:
                s = jnp.where(same_mask, s, jnp.float32(-1e30))
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(_dot(p.astype(out_dtype), v).astype(out_dtype))
        per_b.append(jnp.concatenate(outs, axis=-1))
    return jnp.concatenate(per_b, axis=0) if bb > 1 else per_b[0]


def _flat_valid(row_valid, bb):
    """Tile a per-group (N, 1) row-validity mask to (bb*N, 1) flattened rows
    (every group in a batch block shares the same token tile)."""
    if row_valid is None:
        return None
    N = row_valid.shape[0]
    return jnp.broadcast_to(row_valid[None], (bb, N, 1)).reshape(bb * N, 1)


def _ln_rows(x, scale, bias, eps=1e-6):
    """LayerNorm over the last axis, fp32 accumulation (flax semantics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)


# Shared in-kernel helpers: ONE copy of the LN forward/backward math and
# the spatial block-diagonal mask, used by every fused kernel here and in
# fused_mlp/fused_pair — the eps and mask conventions are parity surfaces
# and must not drift between kernels.

def _ln_fwd_stats(xb, s_ref, b_ref, eps=1e-6):
    """LN forward returning (xhat, rstd, h_f32) for reuse in backward."""
    xf = xb.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    h = xhat * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    return xhat, rstd, h


def _ln_bwd_rows(dh, xhat, rstd, s_ref, dls_ref, dlb_ref):
    """LN backward; accumulates scale/bias grads, returns dx rows (f32)."""
    dls_ref[0] += jnp.sum(dh * xhat, axis=0)
    dlb_ref[0] += jnp.sum(dh, axis=0)
    dy = dh * s_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    return rstd * (dy - m1 - xhat * m2)


def _spatial_masks(N, num_joints, total_tokens):
    """(row_valid (N,1), same_frame (N,N)) for a grouped-spatial tile at
    grid position program_id(1). same_frame is a select mask (never an
    additive bias) so undefined values in partial edge blocks cannot leak
    through as +-inf."""
    from jax.experimental import pallas as pl

    start = pl.program_id(1) * N
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) + start
    row_valid = row_ids < total_tokens
    row_f = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) // num_joints
    col_f = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1) // num_joints
    return row_valid, row_f == col_f


def _fused_block_kernel(num_heads, scale, bb, num_joints, total_tokens, mode,
                        use_ln, residual, x_ref, ln_s_ref, ln_b_ref,
                        wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref):
    from jax.experimental import pallas as pl

    N = x_ref.shape[1]
    same_mask = None
    row_valid = None
    if mode == "spatial":
        row_valid, same_mask = _spatial_masks(N, num_joints, total_tokens)
    for b in range(bb):
        xb = x_ref[b]  # (N, C)
        if row_valid is not None:
            # zero padding rows so masked-out weights can't pull NaNs
            xb = jnp.where(row_valid, xb, 0)
        h = _ln_rows(xb, ln_s_ref[0], ln_b_ref[0]).astype(xb.dtype) \
            if use_ln else xb
        qkv = _dot(h, wqkv_ref[:]) + bqkv_ref[0]           # (N, 3C) f32
        attn = _attn_rows(qkv, num_heads, scale, same_mask, xb.dtype)
        out = _dot(attn, wproj_ref[:]) + bproj_ref[0]      # (N, C) f32
        if residual:
            out = out + xb.astype(jnp.float32)
        o_ref[b] = out.astype(o_ref.dtype)


def _fused_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                        num_heads, scale, mode, use_ln, residual):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, J, C = x.shape
    if mode == "temporal":
        N, total = F, None
        x2 = x.reshape(B, F, J * C)
        bb = _pick_batch_block(B, F * C * x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
        out_shape = (B, F, J * C)
    else:
        tf = 8  # 8*J rows per tile: sublane-aligned for any J
        N, total = tf * J, F * J
        x2 = x.reshape(B, F * J, C)
        bb = _pick_batch_block(B, N * C * x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, N, C), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, (F + tf - 1) // tf)
        out_shape = (B, F * J, C)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_block_kernel, num_heads, scale, bb, J,
                          total, mode, use_ln, residual),
        grid=grid,
        in_specs=[x_spec, const((1, C)), const((1, C)),
                  const(wqkv.shape), const((1, bqkv.shape[-1])),
                  const(wproj.shape), const((1, bproj.shape[-1]))],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=not _on_tpu(),
    )(x2, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), wqkv,
      bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1))
    return out.reshape(B, F, J, C)


def layer_norm(x, scale, bias, eps=1e-6):
    """Functional LayerNorm (fp32 accumulation, flax semantics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


# --- fused backward: recomputes LN/qkv/attention in VMEM and produces dx
# plus weight/bias/LN gradients. Weight-gradient outputs use constant-index
# blocks, which stay VMEM-resident across the (sequential) grid and
# accumulate; they are zero-initialized by the first program.

def _fused_block_bwd_kernel(num_heads, scale, bb, num_joints, total_tokens,
                            mode, use_ln, residual,
                            x_ref, g_ref, ln_s_ref, ln_b_ref, wqkv_ref,
                            bqkv_ref, wproj_ref,
                            dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                            dwproj_ref, dbproj_ref,
                            qkv_scr, dqkv_scr, attn_scr):
    from jax.experimental import pallas as pl

    N = x_ref.shape[1]
    C = x_ref.shape[-1]
    d = C // num_heads
    eps = 1e-6

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    same_mask = None
    row_valid = None
    if mode == "spatial":
        row_valid, same_mask = _spatial_masks(N, num_joints, total_tokens)

    for b in range(bb):
        if row_valid is not None:
            xb = jnp.where(row_valid, x_ref[b], 0)
            gb = jnp.where(row_valid, g_ref[b], 0)
        else:
            xb = x_ref[b]
            gb = g_ref[b]
        dtype = xb.dtype

        # ---- forward recompute (VMEM) ----
        if use_ln:
            xhat, rstd, hf = _ln_fwd_stats(xb, ln_s_ref, ln_b_ref, eps)
            hb = hf.astype(dtype)
        else:
            hb = xb
        qkv_scr[:] = _dot(hb, wqkv_ref[:]) + bqkv_ref[0]  # (N, 3C) f32

        # ---- output projection backward ----
        # dattn = g W_proj^T ; dW_proj += attn^T g ; db_proj += colsum(g)
        dattn = jax.lax.dot_general(
            gb, wproj_ref[:].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (N, C)
        dbproj_ref[0] += jnp.sum(gb.astype(jnp.float32), axis=0)

        # ---- attention forward + backward per head ----
        for h in range(num_heads):
            qs = slice(h * d, (h + 1) * d)
            ks = slice(C + h * d, C + (h + 1) * d)
            vs = slice(2 * C + h * d, 2 * C + (h + 1) * d)
            q = qkv_scr[:, qs].astype(dtype)
            k = qkv_scr[:, ks].astype(dtype)
            v = qkv_scr[:, vs].astype(dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if same_mask is not None:
                s = jnp.where(same_mask, s, jnp.float32(-1e30))
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)   # (N, N) f32
            pb = p.astype(dtype)
            attn_scr[:, h * d:(h + 1) * d] = _dot(pb, v).astype(dtype)

            da = dattn[:, h * d:(h + 1) * d].astype(dtype)   # (N, d)
            dv = jax.lax.dot_general(pb, da, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(da, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(dtype)
            dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dqkv_scr[:, qs] = dq
            dqkv_scr[:, ks] = dk
            dqkv_scr[:, vs] = dv

        dwproj_ref[:] += jax.lax.dot_general(
            attn_scr[:], gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # ---- qkv projection backward ----
        dqkv = dqkv_scr[:].astype(dtype)
        dwqkv_ref[:] += jax.lax.dot_general(
            hb, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[0] += jnp.sum(dqkv_scr[:], axis=0)
        dh = jax.lax.dot_general(
            dqkv, wqkv_ref[:].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (N, C)

        # ---- LayerNorm backward + residual ----
        if use_ln:
            dx = _ln_bwd_rows(dh, xhat, rstd, ln_s_ref, dls_ref, dlb_ref)
        else:
            dx = dh
        if residual:
            dx = dx + gb.astype(jnp.float32)
        dx_ref[b] = dx.astype(dx_ref.dtype)


def _fused_block_bwd_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                            num_heads, scale, mode, use_ln, residual, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, J, C = x.shape
    if mode == "temporal":
        N, total = F, None
        reshape = (B, F, J * C)
        bb = _pick_bwd_batch_block(B, F, C, x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
    else:
        tf = 8
        N, total = tf * J, F * J
        reshape = (B, F * J, C)
        bb = _pick_bwd_batch_block(B, tf * J, C, x.dtype.itemsize)
        x_spec = pl.BlockSpec((bb, N, C), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, (F + tf - 1) // tf)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_fused_block_bwd_kernel, num_heads, scale, bb, J,
                          total, mode, use_ln, residual),
        grid=grid,
        in_specs=[x_spec, x_spec, const((1, C)), const((1, C)),
                  const(wqkv.shape), const((1, 3 * C)), const(wproj.shape)],
        out_specs=(x_spec, const((1, C)), const((1, C)), const(wqkv.shape),
                   const((1, 3 * C)), const(wproj.shape), const((1, C))),
        out_shape=(
            jax.ShapeDtypeStruct(reshape, x.dtype),       # dx
            jax.ShapeDtypeStruct((1, C), f32),            # dln_scale
            jax.ShapeDtypeStruct((1, C), f32),            # dln_bias
            jax.ShapeDtypeStruct(wqkv.shape, f32),        # dwqkv
            jax.ShapeDtypeStruct((1, 3 * C), f32),        # dbqkv
            jax.ShapeDtypeStruct(wproj.shape, f32),       # dwproj
            jax.ShapeDtypeStruct((1, C), f32),            # dbproj
        ),
        scratch_shapes=[
            pltpu.VMEM((N, 3 * C), f32),   # qkv
            pltpu.VMEM((N, 3 * C), f32),   # dqkv
            pltpu.VMEM((N, C), x.dtype),   # attn
        ],
        compiler_params=_vmem_params(40 << 20),
        interpret=not _on_tpu(),
    )(x.reshape(reshape), g.reshape(reshape),
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), wqkv,
      bqkv.reshape(1, -1), wproj)
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = outs
    zero_ln = (jnp.zeros_like(ln_scale), jnp.zeros_like(ln_bias))
    return (dx.reshape(B, F, J, C).astype(x.dtype),
            dls[0].astype(ln_scale.dtype) if use_ln else zero_ln[0],
            dlb[0].astype(ln_bias.dtype) if use_ln else zero_ln[1],
            dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj[0])  # f32; caller casts


def _fused_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                     num_heads, scale, mode, use_ln, residual):
    """Reference composition: the numerical anchor for kernel parity tests
    and the C%128!=0 fallback (the live backward is the fused Pallas
    kernel). Spatial uses the grouped block-diagonal layout so score
    tensors stay ~1.9x padded instead of 10.6x."""
    C = x.shape[-1]
    h = layer_norm(x, ln_scale, ln_bias) if use_ln else x
    qkv = h @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    if mode == "spatial":
        attn = _attention_xla_spatial_grouped(q, k, v, num_heads, scale)
    else:
        attn = _attention_xla(q, k, v, num_heads, scale, mode)
    out = attn @ wproj.astype(x.dtype) + bproj.astype(x.dtype)
    return x + out if residual else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                          num_heads, scale, mode, use_ln=False,
                          residual=False):
    """[LayerNorm ->] qkv projection -> single-axis attention -> output
    projection [-> +x residual], fused in one kernel per axis group.

    x: (B, F, J, C); wqkv: (C, 3C); wproj: (C, C). Backward is the fused
    Pallas kernel _fused_block_bwd_pallas (recompute-in-VMEM, no stored
    activations); _fused_block_xla is the numerical reference only.
    """
    return _fused_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                               bproj, num_heads, scale, mode, use_ln,
                               residual)


def _fused_block_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                     num_heads, scale, mode, use_ln, residual):
    out = fused_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                                bproj, num_heads, scale, mode, use_ln,
                                residual)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _fused_block_bwd(num_heads, scale, mode, use_ln, residual, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj = res
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = _fused_block_bwd_pallas(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, num_heads, scale, mode,
        use_ln, residual, g)
    # the cotangent dtype must match the primal's own dtype (bproj may
    # legitimately differ from wproj, e.g. fp32 bias with bf16 weight)
    return dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj.astype(bproj.dtype)


fused_attention_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def coupled_attention(q, k, v, num_heads: int, scale: float):
    """Joint-time coupled attention: all F*J tokens attend to each other
    (the reference's legacy "coupling"/"vanilla" Attention modes,
    DSTformer.py:130-137/163-176). XLA path only — these modes are not on
    the DSTformer hot path."""
    B, F, J, C = q.shape
    qh, kh, vh = (_split_heads(x.reshape(B, F * J, 1, C), num_heads)
                  for x in (q, k, v))
    perm = "bnjhd->bjhnd"  # tokens=F*J on the attention axis
    out = _sdpa(jnp.einsum(perm, qh), jnp.einsum(perm, kh),
                jnp.einsum(perm, vh), scale)
    return _merge_heads(jnp.einsum("bjhnd->bnjhd", out)).reshape(B, F, J, C)
