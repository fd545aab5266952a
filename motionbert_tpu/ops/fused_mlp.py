"""Fused MLP sub-block kernel: [LayerNorm ->] fc1 -> GELU -> fc2
[-> +x residual] without HBM round-trips for the hidden activations.

The MLP is token-wise, so the kernel grids over flat token tiles; the
(C, hidden) / (hidden, C) weights ride constant-index blocks and stay
VMEM-resident across the grid. Backward is the fused Pallas kernel
_fused_mlp_bwd_pallas (custom VJP, recompute-in-VMEM); _fused_mlp_xla is
the numerical reference only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionbert_tpu.ops.attention import (
    _dot, _ln_bwd_rows, _ln_fwd_stats, _ln_rows, _on_tpu, layer_norm)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf approximation (f32, |err| <= 1.5e-7)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + np.float32(0.3275911) * ax)
    poly = t * (np.float32(0.254829592) + t * (
        np.float32(-0.284496736) + t * (np.float32(1.421413741) + t * (
            np.float32(-1.453152027) + t * np.float32(1.061405429)))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _fused_mlp_kernel(use_ln, residual, x_ref, ln_s_ref, ln_b_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    xb = x_ref[:]  # (T, C)
    h = _ln_rows(xb, ln_s_ref[0], ln_b_ref[0]).astype(xb.dtype) \
        if use_ln else xb
    h = _dot(h, w1_ref[:]) + b1_ref[0]           # (T, hidden) f32
    # exact-erf GELU (torch nn.GELU default). Mosaic lowers neither erf nor
    # erfc, so erf is computed with the Abramowitz-Stegun 7.1.26 rational
    # approximation (|err| <= 1.5e-7, far below bf16 resolution).
    h = 0.5 * h * (1.0 + _erf(h * np.float32(0.7071067811865476)))
    out = _dot(h.astype(xb.dtype), w2_ref[:]) + b2_ref[0]
    if residual:
        out = out + xb.astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _fused_mlp_pallas(x, ln_s, ln_b, w1, b1, w2, b2, use_ln, residual,
                      tile: int = 512):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    C = x.shape[-1]
    tokens = 1
    for s in x.shape[:-1]:
        tokens *= s
    x2 = x.reshape(tokens, C)
    # fixed tile with a cdiv grid: the op is token-wise, so a partial edge
    # block is harmless (out-of-range stores are dropped; no cross-token
    # mixing). tile * hidden f32 is the VMEM high-water mark.
    tile = max(8, min(tile, tokens))

    x_spec = pl.BlockSpec((tile, C), lambda t: (t, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, use_ln, residual),
        grid=((tokens + tile - 1) // tile,),
        in_specs=[x_spec, const((1, C)), const((1, C)), const(w1.shape),
                  const((1, b1.shape[-1])), const(w2.shape),
                  const((1, b2.shape[-1]))],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((tokens, C), x.dtype),
        interpret=not _on_tpu(),
    )(x2, ln_s.reshape(1, -1), ln_b.reshape(1, -1), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1))
    return out.reshape(orig_shape)


def _fused_mlp_bwd_kernel(use_ln, residual, total_tokens,
                          x_ref, g_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref,
                          w2_ref,
                          dx_ref, dls_ref, dlb_ref, dw1_ref, db1_ref,
                          dw2_ref, db2_ref):
    from jax.experimental import pallas as pl

    T, C = x_ref.shape
    eps = 1e-6

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # partial edge tile: zero invalid token rows so they contribute nothing
    start = pl.program_id(0) * T
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + start
    row_valid = row_ids < total_tokens
    xb = jnp.where(row_valid, x_ref[:], 0)
    gb = jnp.where(row_valid, g_ref[:], 0)
    dtype = xb.dtype

    # forward recompute
    if use_ln:
        xhat, rstd, hf = _ln_fwd_stats(xb, ln_s_ref, ln_b_ref, eps)
        h0 = hf.astype(dtype)
    else:
        h0 = xb
    z = _dot(h0, w1_ref[:]) + b1_ref[0]                  # (T, H) f32
    inv_sqrt2 = np.float32(0.7071067811865476)
    cdf = 0.5 * (1.0 + _erf(z * inv_sqrt2))
    a = (z * cdf).astype(dtype)

    # fc2 backward
    dw2_ref[:] += jax.lax.dot_general(
        a, gb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[0] += jnp.sum(gb.astype(jnp.float32), axis=0)
    da = jax.lax.dot_general(
        gb, w2_ref[:].astype(dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (T, H)

    # exact-GELU derivative: Phi(z) + z * phi(z)
    pdf = jnp.exp(-0.5 * z * z) * np.float32(0.3989422804014327)
    dz = (da * (cdf + z * pdf)).astype(dtype)

    # fc1 backward
    dw1_ref[:] += jax.lax.dot_general(
        h0, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db1_ref[0] += jnp.sum(dz.astype(jnp.float32), axis=0)
    dh = jax.lax.dot_general(
        dz, w1_ref[:].astype(dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (T, C)

    if use_ln:
        dx = _ln_bwd_rows(dh, xhat, rstd, ln_s_ref, dls_ref, dlb_ref)
    else:
        dx = dh
    if residual:
        dx = dx + gb.astype(jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _fused_mlp_bwd_pallas(x, ln_s, ln_b, w1, b1, w2, use_ln, residual, g,
                          tile: int = 512):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    C = x.shape[-1]
    tokens = 1
    for s in x.shape[:-1]:
        tokens *= s
    tile = max(8, min(tile, tokens))
    x2 = x.reshape(tokens, C)
    g2 = g.reshape(tokens, C)

    x_spec = pl.BlockSpec((tile, C), lambda t: (t, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),
                                       memory_space=pltpu.VMEM)
    f32 = jnp.float32
    Hd = w1.shape[1]
    outs = pl.pallas_call(
        functools.partial(_fused_mlp_bwd_kernel, use_ln, residual, tokens),
        grid=((tokens + tile - 1) // tile,),
        in_specs=[x_spec, x_spec, const((1, C)), const((1, C)),
                  const(w1.shape), const((1, Hd)), const(w2.shape)],
        out_specs=(x_spec, const((1, C)), const((1, C)), const(w1.shape),
                   const((1, Hd)), const(w2.shape), const((1, C))),
        out_shape=(
            jax.ShapeDtypeStruct((tokens, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct(w1.shape, f32),
            jax.ShapeDtypeStruct((1, Hd), f32),
            jax.ShapeDtypeStruct(w2.shape, f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ),
        interpret=not _on_tpu(),
    )(x2, g2, ln_s.reshape(1, -1), ln_b.reshape(1, -1), w1,
      b1.reshape(1, -1), w2)
    dx, dls, dlb, dw1, db1, dw2, db2 = outs
    return (dx.reshape(orig_shape),
            (dls[0] if use_ln else jnp.zeros_like(dls[0])).astype(ln_s.dtype),
            (dlb[0] if use_ln else jnp.zeros_like(dlb[0])).astype(ln_b.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0])  # f32; caller casts


def _fused_mlp_xla(x, ln_s, ln_b, w1, b1, w2, b2, use_ln, residual):
    h = layer_norm(x, ln_s, ln_b) if use_ln else x
    h = h @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    out = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return x + out if residual else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp_block(x, ln_s, ln_b, w1, b1, w2, b2, use_ln=False,
                    residual=False):
    return _fused_mlp_pallas(x, ln_s, ln_b, w1, b1, w2, b2, use_ln, residual)


def _fwd(x, ln_s, ln_b, w1, b1, w2, b2, use_ln, residual):
    out = fused_mlp_block(x, ln_s, ln_b, w1, b1, w2, b2, use_ln, residual)
    return out, (x, ln_s, ln_b, w1, b1, w2, b2)


def _bwd(use_ln, residual, res, g):
    x, ln_s, ln_b, w1, b1, w2, b2 = res
    dx, dls, dlb, dw1, db1, dw2, db2 = _fused_mlp_bwd_pallas(
        x, ln_s, ln_b, w1, b1, w2, use_ln, residual, g)
    # b2's cotangent must match b2's own dtype, not w2's
    return dx, dls, dlb, dw1, db1, dw2, db2.astype(b2.dtype)


fused_mlp_block.defvjp(_fwd, _bwd)
