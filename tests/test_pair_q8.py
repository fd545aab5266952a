"""W8A8 fused pair kernels (ops/pair_q8.py) vs the bf16/f32 fused pair.

The q8 path is an opt-in inference speed tier (attn_impl="pallas_q8"):
int8 weights x int8 activations on the four projection matmuls, bf16
attention core, straight-through bf16 backward. These tests pin

- the quantization helpers round-trip within the int8 grid's resolution,
- forward parity vs the full-precision pair within W8A8's expected error
  (per-row activation scales x per-channel weight scales => ~1% relative),
- the backward is EXACTLY the full-precision pair backward (straight-
  through), so training with q8 inference previews cannot corrupt grads.

Runs in Pallas interpret mode on CPU (C=128 satisfies lane alignment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.ops.fused_pair import (
    fused_gated_pair_block, fused_pair_block)
from motionbert_tpu.ops.pair_q8 import (
    _q8_rows, fused_gated_pair_block_q8, fused_pair_block_q8, quant_cols)

B, F, J, C, H = 2, 8, 17, 128, 8
HID = 256
SCALE = (C // H) ** -0.5


def _mk(shape, seed, s=0.1):
    return jnp.asarray(
        np.random.RandomState(seed).normal(size=shape) * s, jnp.float32)


def _pair_args(seed0=0):
    return (
        _mk((B, F, J, C), seed0, 0.5),
        _mk((C,), 1) + 1.0, _mk((C,), 2),            # ln1
        _mk((C, 3 * C), 3), _mk((3 * C,), 4),         # qkv
        _mk((C, C), 5), _mk((C,), 6),                 # proj
        _mk((C,), 7) + 1.0, _mk((C,), 8),             # ln2
        _mk((C, HID), 9), _mk((HID,), 10),            # fc1
        _mk((HID, C), 11), _mk((C,), 12),             # fc2
    )


def test_q8_rows_roundtrip():
    a = _mk((37, C), 0, 1.0)
    q, s = _q8_rows(a)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    # symmetric per-row grid: error bounded by half a step (amax/127/2)
    step = np.asarray(jnp.max(jnp.abs(a), axis=-1, keepdims=True)) / 127.0
    assert np.all(np.abs(np.asarray(back - a)) <= step * 0.5 + 1e-7)


def test_quant_cols_roundtrip():
    w = _mk((C, 3 * C), 1, 1.0)
    q, s = quant_cols(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 3 * C)
    back = q.astype(jnp.float32) * s
    step = np.asarray(jnp.max(jnp.abs(w), axis=0, keepdims=True)) / 127.0
    assert np.all(np.abs(np.asarray(back - w)) <= step * 0.5 + 1e-7)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
def test_pair_q8_forward_close(mode):
    args = _pair_args()
    ref = fused_pair_block(*args, H, SCALE, mode)
    q8 = fused_pair_block_q8(*args, H, SCALE, mode)
    rel = float(jnp.linalg.norm(q8 - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_pair_q8_backward_is_straight_through():
    """q8 grads == the full-precision pair grads, bit-for-bit (same VJP)."""
    args = _pair_args()

    def loss(fn, *a):
        return jnp.sum(fn(*a, H, SCALE, "temporal") ** 2)

    # compare under the SAME primal output so only the VJP rule differs:
    # feed an identical cotangent through both custom VJPs
    out_q8, vjp_q8 = jax.vjp(
        lambda *a: fused_pair_block_q8(*a, H, SCALE, "temporal"), *args)
    out_fp, vjp_fp = jax.vjp(
        lambda *a: fused_pair_block(*a, H, SCALE, "temporal"), *args)
    g = _mk(out_fp.shape, 99, 1.0)
    for a, b in zip(vjp_q8(g), vjp_fp(g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gated_pair_q8_forward_close():
    args = _pair_args()
    other = _mk((B, F, J, C), 50, 0.5)
    wg, bg = _mk((2 * C, 2), 13), _mk((2,), 14)
    full = (args[0], other, *args[1:], wg, bg)
    ref = fused_gated_pair_block(*full, H, SCALE, "spatial")
    q8 = fused_gated_pair_block_q8(*full, H, SCALE, "spatial")
    rel = float(jnp.linalg.norm(q8 - ref) / jnp.linalg.norm(ref))
    # the softmax gate compounds the projection quantization error a bit
    assert rel < 0.03, rel


@pytest.mark.slow
def test_model_q8_matches_fp_within_tolerance():
    """Full DSTformer with attn_impl='pallas_q8' stays within ~2% of the
    full-precision pallas path on the same params (checkpoint-
    interchangeable: q8 quantizes in-kernel from the same tree)."""
    from motionbert_tpu.models.dstformer import DSTformer

    cfg = dict(dim_in=3, dim_out=3, dim_feat=128, dim_rep=128, depth=2,
               num_heads=8, mlp_ratio=2, maxlen=27, num_joints=17)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 17, 3), jnp.float32)
    m_ref = DSTformer(attn_impl="pallas", **cfg)
    params = m_ref.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 17, 3)))["params"]
    y_ref = m_ref.apply({"params": params}, x)
    y_q8 = DSTformer(attn_impl="pallas_q8", **cfg).apply(
        {"params": params}, x)
    rel = float(jnp.linalg.norm(y_q8 - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.03, rel
