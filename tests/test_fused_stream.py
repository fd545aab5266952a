"""Stream-fused kernel (ops.fused_stream): one stream's two attention+MLP
pairs (+ optional att_fuse gate) in one kernel vs the pair-kernel and XLA
compositions, including gradients through the chained-pair custom VJP and
the model-level pallas_stream impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.ops.fused_pair import (
    _gate_xla, _pair_xla, fused_gated_pair_block, fused_pair_block)
from motionbert_tpu.ops.fused_stream import (
    _stream_xla, fused_gated_stream_block, fused_stream_block)


def _mk(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).normal(size=shape), jnp.float32)


def _pair_params(C, seed0):
    ln1 = (_mk((C,), seed0) * 0.1 + 1.0, _mk((C,), seed0 + 1) * 0.1)
    wqkv, bqkv = _mk((C, 3 * C), seed0 + 2) * 0.1, \
        _mk((3 * C,), seed0 + 3) * 0.1
    wproj, bproj = _mk((C, C), seed0 + 4) * 0.1, _mk((C,), seed0 + 5) * 0.1
    ln2 = (_mk((C,), seed0 + 6) * 0.1 + 1.0, _mk((C,), seed0 + 7) * 0.1)
    w1, b1 = _mk((C, 2 * C), seed0 + 8) * 0.1, _mk((2 * C,), seed0 + 9) * 0.1
    w2, b2 = _mk((2 * C, C), seed0 + 10) * 0.1, _mk((C,), seed0 + 11) * 0.1
    return (*ln1, wqkv, bqkv, wproj, bproj, *ln2, w1, b1, w2, b2)


# F=19 exercises the spatial tail tile (16 + 3) and an odd temporal length;
# F=9 runs entirely in one short tile (tf = min(16, F)).
@pytest.mark.parametrize("order", [("s", "t"), ("t", "s")])
@pytest.mark.parametrize("F", [9, 19])
def test_stream_matches_pair_composition(order, F):
    B, J, C, H = 2, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    scale = (C // H) ** -0.5
    out = fused_stream_block(x, *p1, *p2, H, scale, order)

    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = fused_pair_block(x, *p1, H, scale, mode1)
    ref_pair = fused_pair_block(y, *p2, H, scale, mode2)
    # identical rounding points -> near-bitwise agreement with the pair path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_pair),
                               atol=2e-6, rtol=2e-6)
    ref_xla = _stream_xla(x, None, p1, p2, None, None, H, scale, order)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_xla),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("order", [("s", "t"), ("t", "s")])
def test_gated_stream_matches_composition(order):
    B, F, J, C, H = 2, 19, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    other = _mk((B, F, J, C), 1)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    wg, bg = _mk((2 * C, 2), 300) * 0.1, _mk((2,), 301) * 0.1 + 0.5
    scale = (C // H) ** -0.5
    out = fused_gated_stream_block(x, other, *p1, *p2, wg, bg, H, scale,
                                   order)

    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = fused_pair_block(x, *p1, H, scale, mode1)
    ref_pair = fused_gated_pair_block(y, other, *p2, wg, bg, H, scale,
                                      mode2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_pair),
                               atol=2e-6, rtol=2e-6)
    ref_xla = _stream_xla(x, other, p1, p2, wg, bg, H, scale, order)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_xla),
                               atol=3e-5, rtol=3e-5)


def test_stream_grads_match_xla():
    B, F, J, C, H = 2, 19, 17, 32, 4
    order = ("s", "t")
    x = _mk((B, F, J, C), 0)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    scale = (C // H) ** -0.5

    def loss_k(x, p1, p2):
        return jnp.sum(fused_stream_block(x, *p1, *p2, H, scale, order) ** 2)

    def loss_x(x, p1, p2):
        return jnp.sum(_stream_xla(x, None, p1, p2, None, None, H, scale,
                                   order) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 1, 2))(x, p1, p2)
    g2 = jax.grad(loss_x, argnums=(0, 1, 2))(x, p1, p2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


def test_gated_stream_grads_match_xla():
    B, F, J, C, H = 2, 9, 17, 32, 4
    order = ("t", "s")
    x = _mk((B, F, J, C), 0)
    other = _mk((B, F, J, C), 1)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    wg, bg = _mk((2 * C, 2), 300) * 0.1, _mk((2,), 301) * 0.1 + 0.5
    scale = (C // H) ** -0.5

    def loss_k(x, other, p1, p2, wg, bg):
        return jnp.sum(fused_gated_stream_block(
            x, other, *p1, *p2, wg, bg, H, scale, order) ** 2)

    def loss_x(x, other, p1, p2, wg, bg):
        return jnp.sum(_stream_xla(x, other, p1, p2, wg, bg, H, scale,
                                   order) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(
        x, other, p1, p2, wg, bg)
    g2 = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4, 5))(
        x, other, p1, p2, wg, bg)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


@pytest.mark.parametrize("order", [("s", "t"), ("t", "s")])
def test_stream_q8_matches_pair_q8_composition(order):
    """W8A8 stream kernel vs the two q8 pair kernels chained. NOT bitwise:
    the stream kernel's j-major spatial rows reorder the f32 softmax
    reductions by an epsilon, and per-row int8 quantization is
    DISCONTINUOUS — an epsilon input shift can flip a rounded int8 by one
    step (~1 part in 127 of the row scale). Tolerance reflects one-step
    quantization flips, far below the q8 tier's own ~1-3% forward error."""
    from motionbert_tpu.ops.fused_stream import fused_stream_block_q8
    from motionbert_tpu.ops.pair_q8 import fused_pair_block_q8

    B, F, J, C, H = 2, 19, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    scale = (C // H) ** -0.5
    out = fused_stream_block_q8(x, *p1, *p2, H, scale, order)
    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = fused_pair_block_q8(x, *p1, H, scale, mode1)
    ref = fused_pair_block_q8(y, *p2, H, scale, mode2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)


def test_gated_stream_q8_matches_composition_and_bf16_grads():
    """Gated W8A8 stream == gated q8 pair composition; its straight-through
    backward is BY CONSTRUCTION the bf16 stream backward — assert the
    gradients agree exactly (catches defvjp wiring/arity mistakes)."""
    from motionbert_tpu.ops.fused_stream import (
        fused_gated_stream_block, fused_gated_stream_block_q8)
    from motionbert_tpu.ops.pair_q8 import (
        fused_gated_pair_block_q8, fused_pair_block_q8)

    B, F, J, C, H = 2, 9, 17, 32, 4
    order = ("t", "s")
    x = _mk((B, F, J, C), 0)
    other = _mk((B, F, J, C), 1)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    wg, bg = _mk((2 * C, 2), 300) * 0.1, _mk((2,), 301) * 0.1 + 0.5
    scale = (C // H) ** -0.5
    out = fused_gated_stream_block_q8(x, other, *p1, *p2, wg, bg, H, scale,
                                      order)
    y = fused_pair_block_q8(x, *p1, H, scale, "temporal")
    ref = fused_gated_pair_block_q8(y, other, *p2, wg, bg, H, scale,
                                    "spatial")
    # one-step int8 quantization flips (see the ungated test's docstring)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)

    # same fixed cotangent through both VJPs: the q8 backward IS the bf16
    # stream backward (identical function and residuals), so the pullbacks
    # must agree exactly
    ct = _mk((B, F, J, C), 7)
    _, vjp_q8 = jax.vjp(lambda a, b: fused_gated_stream_block_q8(
        a, b, *p1, *p2, wg, bg, H, scale, order), x, other)
    _, vjp_bf = jax.vjp(lambda a, b: fused_gated_stream_block(
        a, b, *p1, *p2, wg, bg, H, scale, order), x, other)
    for a, b in zip(vjp_q8(ct), vjp_bf(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   rtol=1e-6)


@pytest.mark.slow
def test_model_level_stream_impl_matches_pallas():
    """DSTformer(attn_impl='pallas_stream') == 'pallas' == 'xla' on the
    same params — and the param tree is impl-independent (checkpoint
    interchangeability)."""
    from motionbert_tpu.models.dstformer import DSTformer

    kw = dict(dim_in=3, dim_out=3, dim_feat=128, dim_rep=128, depth=2,
              num_heads=8, mlp_ratio=2.0, num_joints=17, maxlen=27,
              att_fuse=True)
    x = _mk((2, 19, 17, 3), 0)
    m_stream = DSTformer(attn_impl="pallas_stream", **kw)
    m_pallas = DSTformer(attn_impl="pallas", **kw)
    m_xla = DSTformer(attn_impl="xla", **kw)
    params = m_xla.init(jax.random.PRNGKey(0), x)
    ref = m_xla.apply(params, x)
    out_p = m_pallas.apply(params, x)
    out_s = m_stream.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    # identical param trees: init under the stream impl matches xla's
    p2 = m_stream.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p2) == \
        jax.tree_util.tree_structure(params)
    # combined W8A8+stream impl tracks the q8 pair impl (same quantization
    # scheme; tolerance covers one-step int8 flips from row regrouping)
    out_q8s = DSTformer(attn_impl="pallas_stream_q8", **kw).apply(params, x)
    out_q8 = DSTformer(attn_impl="pallas_q8", **kw).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_q8s), np.asarray(out_q8),
                               atol=2e-2, rtol=2e-2)


def test_infeasible_budget_falls_back_to_pair_path(monkeypatch):
    """A configuration whose whole-clip residency exceeds the VMEM budget
    (picker returns None) must silently take the pair-kernel composition —
    the automatic-fallback convention — instead of launching a kernel the
    compiler would reject. The fallback IS the pair path, so agreement is
    exact."""
    from motionbert_tpu.ops import fused_stream as fs
    from motionbert_tpu.ops.pair_q8 import (fused_gated_pair_block_q8,
                                            fused_pair_block_q8)

    B, F, J, C, H = 2, 19, 17, 32, 4
    order = ("s", "t")
    x = _mk((B, F, J, C), 0)
    other = _mk((B, F, J, C), 1)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    wg, bg = _mk((2 * C, 2), 300) * 0.1, _mk((2,), 301) * 0.1 + 0.5
    scale = (C // H) ** -0.5

    monkeypatch.setattr(fs, "STREAM_BUDGET", 1 << 10)  # nothing fits
    assert fs._pick_stream_groups(F, J, C, 2 * C, 4, gated=False) is None

    out = fs.fused_stream_block(x, *p1, *p2, H, scale, order)
    y = fused_pair_block(x, *p1, H, scale, "spatial")
    ref = fused_pair_block(y, *p2, H, scale, "temporal")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    out_g = fs.fused_gated_stream_block(x, other, *p1, *p2, wg, bg, H,
                                        scale, order)
    ref_g = fused_gated_pair_block(y, other, *p2, wg, bg, H, scale,
                                   "temporal")
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(ref_g))

    out_q8 = fs.fused_gated_stream_block_q8(x, other, *p1, *p2, wg, bg, H,
                                            scale, order)
    y8 = fused_pair_block_q8(x, *p1, H, scale, "spatial")
    ref_q8 = fused_gated_pair_block_q8(y8, other, *p2, wg, bg, H, scale,
                                       "temporal")
    np.testing.assert_array_equal(np.asarray(out_q8), np.asarray(ref_q8))

    # gradients still flow through the fallback (custom VJP unaffected)
    g = jax.grad(lambda a: jnp.sum(
        fs.fused_stream_block(a, *p1, *p2, H, scale, order) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_short_clip_takes_pair_fallback():
    """F < 16 must make the picker return None (tf below the 16-sublane
    stride the rolled spatial fori path slices at would hit the Mosaic
    tpu.concatenate offset mismatch the docstring records), so short clips
    route through the pair composition — exactly."""
    from motionbert_tpu.ops import fused_stream as fs

    assert fs._pick_stream_groups(8, 17, 128, 256, 2, gated=False) is None
    assert fs._pick_stream_groups(15, 17, 128, 256, 2, gated=True,
                                  q8=True) is None

    B, F, J, C, H = 2, 8, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    scale = (C // H) ** -0.5
    out = fs.fused_stream_block(x, *p1, *p2, H, scale, ("s", "t"))
    y = fused_pair_block(x, *p1, H, scale, "spatial")
    ref = fused_pair_block(y, *p2, H, scale, "temporal")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("order", [("s", "t"), ("t", "s")])
def test_forced_multi_tile_groups_cover_fori_and_leftovers(order,
                                                           monkeypatch):
    """Force ks=2/kt=3 at F=51 (3 full 16-frame tiles + a 3-frame tail;
    17 joints = 5 kt-groups + 2 leftover joints) so ONE launch exercises
    every group path of the kernel at once: the spatial fori_loop body
    grouping ks tiles per matmul, the leftover full tile, the padded tail
    tile, the temporal fori_loop body, and the leftover joints. Flagship
    dims land on ks=1/kt=1 and the small-dim tests on 0-1 fori trips, so
    without this the rolled-loop paths ship untested."""
    from motionbert_tpu.ops import fused_stream as fs

    B, F, J, C, H = 2, 51, 17, 32, 4
    x = _mk((B, F, J, C), 0)
    other = _mk((B, F, J, C), 1)
    p1 = _pair_params(C, 100)
    p2 = _pair_params(C, 200)
    wg, bg = _mk((2 * C, 2), 300) * 0.1, _mk((2,), 301) * 0.1 + 0.5
    scale = (C // H) ** -0.5

    monkeypatch.setattr(fs, "_pick_stream_groups",
                        lambda *a, **k: (16, 2, 3))

    out = fs.fused_stream_block(x, *p1, *p2, H, scale, order)
    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = fused_pair_block(x, *p1, H, scale, mode1)
    ref = fused_pair_block(y, *p2, H, scale, mode2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)

    out_g = fs.fused_gated_stream_block(x, other, *p1, *p2, wg, bg, H,
                                        scale, order)
    ref_g = fused_gated_pair_block(y, other, *p2, wg, bg, H, scale, mode2)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               atol=2e-6, rtol=2e-6)
