"""W8A8 fused pair kernels: int8 weights x int8 activations on the MXU for
the four projection matmuls (qkv / proj / fc1 / fc2 — ~92% of model FLOPs),
bf16 for the softmax(QK^T)V core and all elementwise math.

Motivation: the 5x-A100 north star (600 clips/s = 222 TFLOP/s effective)
exceeds the chip's bf16 ceiling (measured 116-165 TFLOP/s run to run,
median ~147 — tools/probe_peak.py), so only lower precision could reach
it. In practice it doesn't here: at this model's K=512 contractions the
chip sustains ~115-125 TFLOP/s REGARDLESS of precision (int8's 2x issue
rate only appears at K>=2048, tools/probe_int8_shapes.py), so this tier
delivers ~+6% at model level, not 1.47x — shipped as an opt-in serving
tier with the evidence table in the bench artifact (docs/design.md
"Roofline accounting").

Scheme (standard W8A8, e.g. LLM.int8()-family serving kernels):
- weights: per-output-channel symmetric int8, quantized OUTSIDE the kernel
  (inside jit — hoisted out of chained loops, amortized in serving);
- activations: per-row symmetric int8, quantized in-kernel on the VPU
  (absmax -> scale -> round) riding the elementwise slack;
- matmul: int8 x int8 -> int32 accumulate on the MXU, dequantized with
  rank-1 scale product (row_scale x col_scale) fused into the bias add.

Backward: the bf16 fused pair backward (straight-through estimator —
standard QAT practice). The backward IS the bf16 kernel, covered by its
fp32-anchor verification (tools/verify_kernels.py); the q8 FORWARD is
gated on-chip inside every bench run (bench._q8_accuracy: rel err vs the
fp32 flagship golden must clear Q8_REL_ERR_GATE for the q8 headline) and
by tests/test_pair_q8.py.

This path is opt-in (attn_impl="pallas_q8"); precision-gated surfaces
(goldens, tools/parity_gate.py) keep pinning fp32/bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionbert_tpu.ops.attention import (
    _attn_rows_flat, _dot, _flat_valid, _ln_rows, _on_tpu, _spatial_masks,
    _vmem_params)
from motionbert_tpu.ops.fused_mlp import _erf


def _q8_rows(a):
    """Per-row symmetric int8 quantization of f32 rows -> (int8, (rows,1)
    f32 scale)."""
    amax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, jnp.float32(1e-6)) * np.float32(1.0 / 127.0)
    q = jnp.clip(jnp.round(a / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _dot8(a8, w8):
    """int8 x int8 -> int32 MXU matmul."""
    return jax.lax.dot_general(a8, w8, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _qdot(a_f32, w8_ref, ws_ref, bias_row):
    """Quantize rows of a_f32, int8-matmul against the pre-quantized weight
    block, dequantize, add bias; returns f32 rows."""
    a8, ascale = _q8_rows(a_f32)
    acc = _dot8(a8, w8_ref[:]).astype(jnp.float32)
    return acc * ascale * ws_ref[0] + bias_row


def quant_cols(w):
    """Per-output-channel symmetric int8 weight quantization (call outside
    the kernel; jit-hoistable). Returns (int8 (K, N), f32 (1, N) scale)."""
    wf = w.astype(jnp.float32)
    a = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.maximum(a, jnp.float32(1e-8)) * np.float32(1.0 / 127.0)
    q = jnp.clip(jnp.round(wf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _pair_rows_q8(xb, bb, num_heads, scale, same_mask,
                  ln1_s_ref, ln1_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                  wproj_ref, sproj_ref, bproj_ref, ln2_s_ref, ln2_b_ref,
                  w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref):
    """bb stacked token groups through the W8A8 pair; returns (bb*N, C)
    rows in the compute dtype. Same structure as fused_pair._pair_rows with
    the four projection matmuls swapped to _qdot."""
    dtype = xb.dtype
    h = _ln_rows(xb, ln1_s_ref[0], ln1_b_ref[0])            # f32
    qkv = _qdot(h, wqkv_ref, sqkv_ref, bqkv_ref[0])         # (bb*N, 3C) f32
    attn = _attn_rows_flat(qkv, bb, num_heads, scale, same_mask, dtype)
    y = _qdot(attn.astype(jnp.float32), wproj_ref, sproj_ref,
              bproj_ref[0]) + xb.astype(jnp.float32)
    yb = y.astype(dtype)
    h2 = _ln_rows(yb, ln2_s_ref[0], ln2_b_ref[0])           # f32
    z = _qdot(h2, w1_ref, s1_ref, b1_ref[0])                # (bb*N, hid) f32
    z = 0.5 * z * (1.0 + _erf(z * np.float32(0.7071067811865476)))
    out = _qdot(z, w2_ref, s2_ref, b2_ref[0]) + yb.astype(jnp.float32)
    return out.astype(dtype)


def _pair_q8_kernel(num_heads, scale, bb, num_joints, total_tokens, mode,
                    x_ref, ln1_s_ref, ln1_b_ref, wqkv_ref, sqkv_ref,
                    bqkv_ref, wproj_ref, sproj_ref, bproj_ref, ln2_s_ref,
                    ln2_b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                    b2_ref, o_ref):
    from motionbert_tpu.ops.fused_pair import _read_flat

    N = x_ref.shape[1]
    row_valid, same_mask = (None, None) if mode != "spatial" else \
        _spatial_masks(N, num_joints, total_tokens)
    rv = _flat_valid(row_valid, bb)
    xb = _read_flat(x_ref, bb, rv)
    out = _pair_rows_q8(
        xb, bb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref,
        wqkv_ref, sqkv_ref, bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
        ln2_s_ref, ln2_b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
        b2_ref)
    o_ref[:] = out.reshape(x_ref.shape).astype(o_ref.dtype)


def _gated_pair_q8_kernel(num_heads, scale, bb, num_joints, total_tokens,
                          mode, x_ref, other_ref, ln1_s_ref, ln1_b_ref,
                          wqkv_ref, sqkv_ref, bqkv_ref, wproj_ref, sproj_ref,
                          bproj_ref, ln2_s_ref, ln2_b_ref, w1_ref, s1_ref,
                          b1_ref, w2_ref, s2_ref, b2_ref, wga_ref, wgb_ref,
                          bg_ref, o_ref):
    from motionbert_tpu.ops.fused_pair import _gate_rows, _read_flat

    N = x_ref.shape[1]
    row_valid, same_mask = (None, None) if mode != "spatial" else \
        _spatial_masks(N, num_joints, total_tokens)
    rv = _flat_valid(row_valid, bb)
    xb = _read_flat(x_ref, bb, rv)
    out = _pair_rows_q8(
        xb, bb, num_heads, scale, same_mask, ln1_s_ref, ln1_b_ref,
        wqkv_ref, sqkv_ref, bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
        ln2_s_ref, ln2_b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
        b2_ref)
    other = _read_flat(other_ref, bb, None)
    # the gate's (C, 2) dots are negligible: keep them bf16 (_gate_rows is
    # the single shared epilogue implementation)
    o_ref[:] = _gate_rows(other, out, wga_ref, wgb_ref, bg_ref).reshape(
        o_ref.shape).astype(o_ref.dtype)


def _q8_launch(kernel_body, x, other, weights, num_heads, scale, mode):
    """Shared launch: quantize weight blocks (outside the pallas_call),
    build specs, run. weights is the ordered dict-free tuple
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2
    [, wg, bg])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from motionbert_tpu.ops.fused_pair import _pick_pair_batch_block

    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2) = weights[:12]
    gated = other is not None
    B, F, J, C = x.shape
    hidden = w1.shape[1]
    if mode == "temporal":
        N, total = F, None
        reshape = (B, F, J * C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize,
                                    gated=gated)
        x_spec = pl.BlockSpec((bb, F, C), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, J)
    else:
        from motionbert_tpu.ops.fused_pair import SPATIAL_TF
        tf = SPATIAL_TF
        N, total = tf * J, F * J
        reshape = (B, F * J, C)
        bb = _pick_pair_batch_block(B, N, C, hidden, x.dtype.itemsize,
                                    gated=gated)
        x_spec = pl.BlockSpec((bb, N, C), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
        grid = (B // bb, (F + tf - 1) // tf)

    wqkv8, sqkv = quant_cols(wqkv)
    wproj8, sproj = quant_cols(wproj)
    w18, s1 = quant_cols(w1)
    w28, s2 = quant_cols(w2)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [x_spec] + ([x_spec] if gated else []) + [
        const((1, C)), const((1, C)),
        const(wqkv.shape), const((1, 3 * C)), const((1, 3 * C)),
        const(wproj.shape), const((1, C)), const((1, C)),
        const((1, C)), const((1, C)),
        const(w1.shape), const((1, hidden)), const((1, hidden)),
        const(w2.shape), const((1, C)), const((1, C))]
    inputs = [x.reshape(reshape)] \
        + ([other.reshape(reshape)] if gated else []) + [
        ln1_s.reshape(1, -1), ln1_b.reshape(1, -1),
        wqkv8, sqkv, bqkv.reshape(1, -1),
        wproj8, sproj, bproj.reshape(1, -1),
        ln2_s.reshape(1, -1), ln2_b.reshape(1, -1),
        w18, s1, b1.reshape(1, -1),
        w28, s2, b2.reshape(1, -1)]
    if gated:
        wg, bg = weights[12], weights[13]
        in_specs += [const((C, 2)), const((C, 2)), const((1, 2))]
        inputs += [wg[:C], wg[C:], bg.reshape(1, -1)]

    out = pl.pallas_call(
        functools.partial(kernel_body, num_heads, scale, bb, J, total, mode),
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(reshape, x.dtype),
        compiler_params=_vmem_params(28 << 20),
        interpret=not _on_tpu(),
    )(*inputs)
    return out.reshape(B, F, J, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_pair_block_q8(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                        ln2_b, w1, b1, w2, b2, num_heads, scale, mode):
    """W8A8 forward of ops.fused_pair.fused_pair_block (same signature,
    bf16/f32 weights in; quantization is internal)."""
    return _q8_launch(_pair_q8_kernel, x, None,
                      (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                       w1, b1, w2, b2), num_heads, scale, mode)


def _pair_q8_fwd(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                 w1, b1, w2, b2, num_heads, scale, mode):
    out = fused_pair_block_q8(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                              ln2_s, ln2_b, w1, b1, w2, b2, num_heads,
                              scale, mode)
    return out, (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                 w1, b1, w2, b2)


def _pair_q8_bwd(num_heads, scale, mode, res, g):
    """Straight-through: the bf16 fused pair backward on the full-precision
    weights."""
    from motionbert_tpu.ops.fused_pair import _pair_bwd_pallas

    (x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2) = res
    gr = _pair_bwd_pallas(x, None, g, ln1_s, ln1_b, wqkv, bqkv, wproj,
                          bproj, ln2_s, ln2_b, w1, b1, w2, b2, None, None,
                          num_heads, scale, mode)
    return (gr["dx"], gr["dls1"], gr["dlb1"], gr["dwqkv"], gr["dbqkv"],
            gr["dwproj"], gr["dbproj"], gr["dls2"], gr["dlb2"],
            gr["dw1"], gr["db1"], gr["dw2"], gr["db2"])


fused_pair_block_q8.defvjp(_pair_q8_fwd, _pair_q8_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18))
def fused_gated_pair_block_q8(x, other, ln1_s, ln1_b, wqkv, bqkv, wproj,
                              bproj, ln2_s, ln2_b, w1, b1, w2, b2, wg, bg,
                              num_heads, scale, mode):
    """W8A8 forward of ops.fused_pair.fused_gated_pair_block."""
    return _q8_launch(_gated_pair_q8_kernel, x, other,
                      (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
                       w1, b1, w2, b2, wg, bg), num_heads, scale, mode)


def _gated_q8_fwd(x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                  ln2_b, w1, b1, w2, b2, wg, bg, num_heads, scale, mode):
    out = fused_gated_pair_block_q8(x, other, ln1_s, ln1_b, wqkv, bqkv,
                                    wproj, bproj, ln2_s, ln2_b, w1, b1, w2,
                                    b2, wg, bg, num_heads, scale, mode)
    return out, (x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s,
                 ln2_b, w1, b1, w2, b2, wg, bg)


def _gated_q8_bwd(num_heads, scale, mode, res, g):
    from motionbert_tpu.ops.fused_pair import _pair_bwd_pallas

    (x, other, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     w1, b1, w2, b2, wg, bg) = res
    gr = _pair_bwd_pallas(x, other, g, ln1_s, ln1_b, wqkv, bqkv, wproj,
                          bproj, ln2_s, ln2_b, w1, b1, w2, b2, wg, bg,
                          num_heads, scale, mode)
    return (gr["dx"], gr["dother"], gr["dls1"], gr["dlb1"], gr["dwqkv"],
            gr["dbqkv"], gr["dwproj"], gr["dbproj"], gr["dls2"], gr["dlb2"],
            gr["dw1"], gr["db1"], gr["dw2"], gr["db2"], gr["dwg"],
            gr["dbg"])


fused_gated_pair_block_q8.defvjp(_gated_q8_fwd, _gated_q8_bwd)
