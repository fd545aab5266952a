"""Fused sub-block kernels (attention and MLP) vs the XLA compositions,
including the absorbed LayerNorm + residual variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.ops.attention import (
    _fused_block_xla, fused_attention_block)
from motionbert_tpu.ops.fused_mlp import _fused_mlp_xla, fused_mlp_block


def _mk(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).normal(size=shape), jnp.float32)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
@pytest.mark.parametrize("use_ln,residual", [(False, False), (True, True)])
def test_fused_attention_block(mode, use_ln, residual):
    B, F, J, C, H = 2, 9, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    ln_s, ln_b = _mk((C,), 1) * 0.1 + 1.0, _mk((C,), 2) * 0.1
    wqkv, bqkv = _mk((C, 3 * C), 3) * 0.1, _mk((3 * C,), 4) * 0.1
    wproj, bproj = _mk((C, C), 5) * 0.1, _mk((C,), 6) * 0.1
    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    scale = (C // H) ** -0.5
    out = fused_attention_block(*args, H, scale, mode, use_ln, residual)
    ref = _fused_block_xla(*args, H, scale, mode, use_ln, residual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=3e-5)
    # gradients through the custom VJP
    g1 = jax.grad(lambda *a: jnp.sum(fused_attention_block(
        *a, H, scale, mode, use_ln, residual) ** 2), argnums=(0, 3, 5))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_fused_block_xla(
        *a, H, scale, mode, use_ln, residual) ** 2), argnums=(0, 3, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


@pytest.mark.parametrize("use_ln,residual", [(False, False), (True, True)])
def test_fused_mlp_block(use_ln, residual):
    T, C, Hd = 37, 32, 64  # deliberately non-multiple-of-tile token count
    x = _mk((T, C), 0)
    ln_s, ln_b = _mk((C,), 1) * 0.1 + 1.0, _mk((C,), 2) * 0.1
    w1, b1 = _mk((C, Hd), 3) * 0.1, _mk((Hd,), 4) * 0.1
    w2, b2 = _mk((Hd, C), 5) * 0.1, _mk((C,), 6) * 0.1
    args = (x, ln_s, ln_b, w1, b1, w2, b2)
    out = fused_mlp_block(*args, use_ln, residual)
    ref = _fused_mlp_xla(*args, use_ln, residual)
    # the in-kernel erf approximation is accurate to ~1.5e-7
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)
    g1 = jax.grad(lambda *a: jnp.sum(
        fused_mlp_block(*a, use_ln, residual) ** 2), argnums=(0, 3, 5))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(
        _fused_mlp_xla(*a, use_ln, residual) ** 2), argnums=(0, 3, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
def test_fused_pair_block(mode):
    """attention+MLP pair in one kernel == the sequential composition."""
    from motionbert_tpu.ops.fused_pair import _pair_xla, fused_pair_block

    B, F, J, C, H = 2, 9, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    ln1 = _mk((C,), 1) * 0.1 + 1.0, _mk((C,), 2) * 0.1
    wqkv, bqkv = _mk((C, 3 * C), 3) * 0.1, _mk((3 * C,), 4) * 0.1
    wproj, bproj = _mk((C, C), 5) * 0.1, _mk((C,), 6) * 0.1
    ln2 = _mk((C,), 7) * 0.1 + 1.0, _mk((C,), 8) * 0.1
    w1, b1 = _mk((C, 2 * C), 9) * 0.1, _mk((2 * C,), 10) * 0.1
    w2, b2 = _mk((2 * C, C), 11) * 0.1, _mk((C,), 12) * 0.1
    args = (x, *ln1, wqkv, bqkv, wproj, bproj, *ln2, w1, b1, w2, b2)
    scale = (C // H) ** -0.5
    out = fused_pair_block(*args, H, scale, mode)
    ref = _pair_xla(*args, H, scale, mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=3e-5)
    # gradients through the custom VJP (x, wqkv, wproj, w1, w2)
    g1 = jax.grad(lambda *a: jnp.sum(fused_pair_block(
        *a, H, scale, mode) ** 2), argnums=(0, 3, 5, 9, 11))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_pair_xla(
        *a, H, scale, mode) ** 2), argnums=(0, 3, 5, 9, 11))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
def test_fused_gated_pair_block(mode):
    """pair + att_fuse gate in one kernel == the XLA composition."""
    from motionbert_tpu.ops.fused_pair import (
        _gated_pair_xla, fused_gated_pair_block)

    B, F, J, C, H = 2, 9, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    other = _mk((B, F, J, C), 20)
    ln1 = _mk((C,), 1) * 0.1 + 1.0, _mk((C,), 2) * 0.1
    wqkv, bqkv = _mk((C, 3 * C), 3) * 0.1, _mk((3 * C,), 4) * 0.1
    wproj, bproj = _mk((C, C), 5) * 0.1, _mk((C,), 6) * 0.1
    ln2 = _mk((C,), 7) * 0.1 + 1.0, _mk((C,), 8) * 0.1
    w1, b1 = _mk((C, 2 * C), 9) * 0.1, _mk((2 * C,), 10) * 0.1
    w2, b2 = _mk((2 * C, C), 11) * 0.1, _mk((C,), 12) * 0.1
    wg = _mk((2 * C, 2), 13) * 0.1
    bg = _mk((2,), 14) * 0.1 + 0.5
    args = (x, other, *ln1, wqkv, bqkv, wproj, bproj, *ln2, w1, b1, w2, b2,
            wg, bg)
    scale = (C // H) ** -0.5
    out = fused_gated_pair_block(*args, H, scale, mode)
    ref = _gated_pair_xla(*args, H, scale, mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=3e-5)
    # gradients through the custom VJP (x, other, wqkv, w2, wg, bg)
    g1 = jax.grad(lambda *a: jnp.sum(fused_gated_pair_block(
        *a, H, scale, mode) ** 2), argnums=(0, 1, 4, 12, 14, 15))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_gated_pair_xla(
        *a, H, scale, mode) ** 2), argnums=(0, 1, 4, 12, 14, 15))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


@pytest.mark.slow
def test_full_model_fused_vs_xla_paths():
    """Whole DSTformer: pallas (fully fused, interpreted on CPU) == xla.

    dim_feat MUST be a multiple of 128: every fused gate in the model is
    `C % 128 == 0` (dstformer.py), so a smaller width would compare the
    XLA path with itself and cover none of the pair wiring."""
    from motionbert_tpu.models.dstformer import DSTformer

    CFG = dict(dim_in=3, dim_out=3, dim_feat=128, dim_rep=128, depth=2,
               num_heads=4, mlp_ratio=2, num_joints=17, maxlen=27)
    mx = DSTformer(attn_impl="xla", **CFG)
    mp = DSTformer(attn_impl="pallas", **CFG)
    x = _mk((2, 9, 17, 3), 7)
    v = mx.init(jax.random.PRNGKey(0), x)
    # identical param trees (checkpoints interchange between paths)
    import jax.tree_util as jtu

    t1 = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(v)[0]}
    t2 = {jtu.keystr(k) for k, _ in
          jtu.tree_flatten_with_path(mp.init(jax.random.PRNGKey(0), x))[0]}
    assert t1 == t2
    np.testing.assert_allclose(np.asarray(mx.apply(v, x)),
                               np.asarray(mp.apply(v, x)), atol=2e-5)


@pytest.mark.slow
def test_lite_geometry_fused_vs_xla_paths():
    """MotionBERT-Lite geometry (dim_feat 256, heads 8, mlp_ratio 4 —
    configs/pretrain/MB_lite.yaml, matching the reference's MB_lite.yaml)
    through the fully fused path. C=256 is the model zoo's second
    128-aligned width: it exercises head_dim 32 and a 1024-wide MLP
    hidden inside the pair kernels, geometries the C=128 test never
    reaches. Depth shrunk 5→2 (kernel wiring repeats per layer pair)."""
    from motionbert_tpu.models.dstformer import DSTformer

    CFG = dict(dim_in=3, dim_out=3, dim_feat=256, dim_rep=256, depth=2,
               num_heads=8, mlp_ratio=4, num_joints=17, maxlen=27)
    mx = DSTformer(attn_impl="xla", **CFG)
    mp = DSTformer(attn_impl="pallas", **CFG)
    x = _mk((2, 9, 17, 3), 11)
    v = mx.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mx.apply(v, x)),
                               np.asarray(mp.apply(v, x)), atol=2e-5)
