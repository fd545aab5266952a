"""DSTformer parity vs reference goldens + architectural invariants."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.models.dstformer import DSTformer
from motionbert_tpu.models.convert import (
    torch_state_dict_to_flax, flax_to_torch_state_dict,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

CFGS = {
    "small": dict(dim_in=3, dim_out=3, dim_feat=64, dim_rep=64, depth=2,
                  num_heads=4, mlp_ratio=2, num_joints=17, maxlen=27),
    "mid": dict(dim_in=3, dim_out=3, dim_feat=128, dim_rep=128, depth=5,
                num_heads=8, mlp_ratio=2, num_joints=17, maxlen=81),
    # flagship width (512/8 heads) at depth=1 — the exact dims the fused
    # kernels run in production (weights stored fp16; outputs generated from
    # the rounded weights, so parity stays exact)
    "flagship": dict(dim_in=3, dim_out=3, dim_feat=512, dim_rep=512, depth=1,
                     num_heads=8, mlp_ratio=2, num_joints=17, maxlen=27),
    # MotionBERT-Lite width (256/mlp_ratio 4, README.md:79) at depth=1 —
    # the zoo's second geometry through the same fused kernels
    "lite": dict(dim_in=3, dim_out=3, dim_feat=256, dim_rep=512, depth=1,
                 num_heads=8, mlp_ratio=4, num_joints=17, maxlen=27),
}


def _load_golden(name):
    z = np.load(os.path.join(GOLDENS, f"dstformer_{name}.npz"))
    sd = {k[3:]: np.asarray(z[k], np.float32)
          for k in z.files if k.startswith("sd:")}
    return z["x"], z["out"], z["rep"], sd


# "small" (C=64) only has the XLA path; "mid" (C=128) and "flagship" (C=512)
# satisfy C % 128 == 0, so golden parity crosses the fused Pallas kernels
# (interpreted on CPU — same code path as the TPU Mosaic build, which
# tools/verify_kernels.py additionally checks on-chip).
@pytest.mark.parametrize("name,attn_impl", [
    ("small", "xla"), ("mid", "xla"),
    # mid-pallas duplicates the flagship-pallas coverage at a geometry
    # whose interpret-mode run costs ~3 min — full tier only
    pytest.param("mid", "pallas", marks=pytest.mark.slow),
    ("flagship", "xla"), ("flagship", "pallas"),
    ("lite", "xla"), ("lite", "pallas"),
])
def test_forward_parity_with_reference(name, attn_impl):
    x, out_ref, rep_ref, sd = _load_golden(name)
    model = DSTformer(attn_impl=attn_impl, **CFGS[name])
    variables = torch_state_dict_to_flax(sd)
    out = model.apply(variables, jnp.asarray(x))
    rep = model.apply(variables, jnp.asarray(x), return_rep=True)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rep), rep_ref, atol=2e-5)


def test_converter_roundtrip():
    _, _, _, sd = _load_golden("small")
    variables = torch_state_dict_to_flax(sd)
    back = flax_to_torch_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], atol=0)


def test_variable_frame_lengths():
    """Same params accept any F <= maxlen (temp_embed truncation)."""
    x, _, _, sd = _load_golden("small")
    model = DSTformer(**CFGS["small"])
    variables = torch_state_dict_to_flax(sd)
    for F in (1, 5, 27):
        xi = jnp.asarray(x[:, :1].repeat(F, axis=1))
        out = model.apply(variables, xi)
        assert out.shape == (2, F, 17, 3)


def test_init_and_shapes():
    model = DSTformer(**CFGS["small"])
    x = jnp.zeros((2, 9, 17, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 9, 17, 3)
    rep = model.apply(variables, x, return_rep=True)
    assert rep.shape == (2, 9, 17, 64)
    # att_fuse gate init: zero weight, 0.5 bias -> both streams weighted 0.5
    p = variables["params"]["ts_attn_0"]
    assert (np.asarray(p["kernel"]) == 0).all()
    assert (np.asarray(p["bias"]) == 0.5).all()


def test_param_count_full_size():
    """Full MotionBERT config ~42.5M params (162MB fp32 ckpt, README.md:78)."""
    model = DSTformer(dim_in=3, dim_out=3, dim_feat=512, dim_rep=512,
                      depth=5, num_heads=8, mlp_ratio=2, num_joints=17,
                      maxlen=243)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 17, 3))))
    n = sum(np.prod(v.shape) for v in
            jax.tree_util.tree_leaves(variables["params"]))
    assert 40e6 < n < 45e6


def test_bf16_close_to_f32():
    x, _, _, sd = _load_golden("small")
    variables = torch_state_dict_to_flax(sd)
    f32 = DSTformer(**CFGS["small"]).apply(variables, jnp.asarray(x))
    bf16 = DSTformer(dtype=jnp.bfloat16, **CFGS["small"]).apply(
        variables, jnp.asarray(x))
    # motion coords are O(1); bf16 end-to-end should stay within ~2e-2
    assert float(jnp.max(jnp.abs(f32 - bf16.astype(jnp.float32)))) < 2e-2


def test_attention_gate_stats():
    """count_attn equivalent: per-layer per-sample gate weights sum to 1
    and start at 0.5/0.5 (zero-kernel, 0.5-bias gate init)."""
    from motionbert_tpu.models.dstformer import attention_gate_stats

    model = DSTformer(**CFGS["small"])
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (3, 9, 17, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # default model: no intermediates collection leaks into init/apply
    assert "intermediates" not in variables
    stats = attention_gate_stats(model, variables, x)
    assert stats["attn_count_s"].shape == (3, CFGS["small"]["depth"])
    np.testing.assert_allclose(
        stats["attn_count_s"] + stats["attn_count_t"], 1.0, atol=1e-5)
    # zero-weight gate init -> exactly balanced streams
    np.testing.assert_allclose(stats["attn_count_s"], 0.5, atol=1e-6)
    # the collect_attn branch must compute the SAME forward as the default
    # path (the sow branch mirrors the gate math; it must never diverge)
    out_default = model.apply(variables, x)
    out_collect = model.copy(collect_attn=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_collect),
                               np.asarray(out_default), atol=1e-6)


def test_reset_classifier():
    """reset_classifier returns a copy with a new head size and stays
    callable on an unbound module (reference DSTformer.py:325-327)."""
    from motionbert_tpu.models.dstformer import DSTformer

    m = DSTformer(dim_feat=32, dim_rep=32, depth=1, num_heads=2, mlp_ratio=2,
                  num_joints=17, maxlen=8)
    m2 = m.reset_classifier(dim_out=60)
    assert m2.dim_out == 60
    p = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 17, 3)))["params"]
    assert m2.apply({"params": p},
                    jnp.zeros((2, 8, 17, 3))).shape == (2, 8, 17, 60)
