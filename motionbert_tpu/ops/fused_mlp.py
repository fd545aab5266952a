"""Fused MLP sub-block kernel: [LayerNorm ->] fc1 -> GELU -> fc2
[-> +x residual] without HBM round-trips for the hidden activations.

The MLP is token-wise, so the kernel grids over flat token tiles; the
(C, hidden) / (hidden, C) weights ride constant-index blocks and stay
VMEM-resident across the grid. Backward recomputes through the XLA
composition (custom VJP), like ops.attention.fused_attention_block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionbert_tpu.ops.attention import _ln_rows, _on_tpu, layer_norm


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


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
    _, vjp = jax.vjp(
        lambda *args: _fused_mlp_xla(*args, use_ln, residual), *res)
    return vjp(g)


fused_mlp_block.defvjp(_fwd, _bwd)
