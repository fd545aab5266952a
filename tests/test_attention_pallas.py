"""Fused Pallas attention kernels vs the XLA reference formulation.

Off-TPU the kernels run in interpreter mode, so these tests exercise the
exact kernel logic (masking, head slicing, edge blocks) on CPU.

C=128 everywhere the kernel itself is under test: st_attention silently
falls back to XLA when the channel dim is not lane-aligned (C % 128 != 0),
so sub-128 dims would compare XLA with itself and cover nothing (a real
regression shipped that way once). The fallback behavior has its own test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.ops.attention import st_attention

C = 128  # lane-aligned: the smallest dim that actually runs the kernels


def _qkv(B, F, J, C, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, (B, F, J, C), jnp.float32) for k in ks]


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
@pytest.mark.parametrize("F", [9, 16, 27])  # 9, 27: partial edge blocks
def test_pallas_matches_xla(mode, F):
    q, k, v = _qkv(2, F, 17, C)
    scale = (C // 4) ** -0.5
    ref = st_attention(q, k, v, mode=mode, num_heads=4, scale=scale,
                       impl="xla")
    fused = st_attention(q, k, v, mode=mode, num_heads=4, scale=scale,
                         impl="pallas")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
def test_pallas_gradients_match_xla(mode):
    q, k, v = _qkv(2, 9, 17, C, seed=1)
    scale = (C // 4) ** -0.5

    def loss(impl):
        def f(q, k, v):
            out = st_attention(q, k, v, mode=mode, num_heads=4, scale=scale,
                               impl=impl)
            return jnp.sum(out ** 2)
        return f

    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_spatial_is_per_frame():
    """Spatial attention must not mix information across frames."""
    q, k, v = _qkv(1, 16, 17, C, seed=2)
    scale = (C // 4) ** -0.5
    out = st_attention(q, k, v, mode="spatial", num_heads=4, scale=scale,
                       impl="pallas")
    # recompute frame 3 alone: must match frame 3 of the full result
    q1, k1, v1 = (x[:, 3:4] for x in (q, k, v))
    out1 = st_attention(q1, k1, v1, mode="spatial", num_heads=4, scale=scale,
                        impl="pallas")
    np.testing.assert_allclose(np.asarray(out[:, 3:4]), np.asarray(out1),
                               atol=2e-5, rtol=2e-5)


def test_temporal_is_per_joint():
    """Temporal attention must not mix information across joints."""
    q, k, v = _qkv(1, 8, 17, C, seed=3)
    scale = (C // 4) ** -0.5
    out = st_attention(q, k, v, mode="temporal", num_heads=4, scale=scale,
                       impl="pallas")
    q1, k1, v1 = (x[:, :, 5:6] for x in (q, k, v))
    out1 = st_attention(q1, k1, v1, mode="temporal", num_heads=4, scale=scale,
                        impl="pallas")
    np.testing.assert_allclose(np.asarray(out[:, :, 5:6]), np.asarray(out1),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
def test_unaligned_dims_fall_back_to_xla(mode):
    """C % 128 != 0 silently uses the XLA path and still computes the
    right answer (the automatic-fallback contract, ops/attention.py)."""
    q, k, v = _qkv(2, 9, 17, 64, seed=4)
    scale = (64 // 4) ** -0.5
    ref = st_attention(q, k, v, mode=mode, num_heads=4, scale=scale,
                       impl="xla")
    out = st_attention(q, k, v, mode=mode, num_heads=4, scale=scale,
                       impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
