"""DSTformer — dual-stream spatio-temporal transformer backbone, in Flax.

Behavioral parity target: /root/reference/lib/model/DSTformer.py:269-361.
Per layer, one S->T branch (spatial attention, MLP, temporal attention, MLP)
and one T->S branch run in parallel on the same input and are fused by a
learned per-channel softmax gate (`ts_attn`, DSTformer.py:340-351;
zero-weight / 0.5-bias init, DSTformer.py:309-311). Input (B, F, J, 3) is
embedded (DSTformer.py:333), gets a spatial pos-embed (1, J, C) and a
temporal embed (1, maxlen, 1, C) truncated to F (DSTformer.py:334-336),
passes `depth` fused dual blocks, then LayerNorm -> pre_logits
(Linear dim_feat->dim_rep + Tanh, DSTformer.py:294-297) -> head
(Linear dim_rep->dim_out, DSTformer.py:300).

TPU-first design notes:
- The whole network keeps the (B, F, J, C) layout; the reference's
  (B*F, J, C) flattening is just a view, so no data movement differs.
- Attention runs through ops.st_attention (XLA einsum or fused Pallas).
- `compute_dtype=bfloat16` runs all matmuls in bf16 on the MXU with fp32
  params and fp32 softmax/LayerNorm accumulation.
- Variable clip length F is handled by slicing the temporal embedding;
  each distinct F compiles once (static shapes under jit).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionbert_tpu.ops.attention import st_attention

Dtype = Any


def trunc_normal_init(std: float = 0.02):
    # reference trunc_normal_(std=.02, a=-2., b=2.) truncates at ABSOLUTE
    # +/-2 (timm convention) = +/-(2/std) sigmas — effectively untruncated
    # at std 0.02. Flax's lower/upper are in sigma units, so scale them;
    # passing +/-2 sigma here would clip ~4.6% of draws and shrink the
    # from-scratch init variance ~12% below the reference's.
    return nn.initializers.truncated_normal(
        stddev=std, lower=-2.0 / std, upper=2.0 / std)


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per (clip, frame).

    Parity: /root/reference/lib/model/drop.py:17-32 (scale by 1/keep_prob,
    binarized mask over the leading axis). The reference blocks run on
    (B*F, J, C) tensors, so its "per-sample" mask is per (clip, frame);
    with this repo's natural (B, F, J, C) layout the mask must cover the
    first TWO axes to keep the same regularization granularity.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = x.shape[:2] + (1,) * (x.ndim - 2)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """fc1 -> GELU -> drop -> fc2 -> drop (reference DSTformer.py:69-85).

    With impl="pallas" and an absorbed pre-LN/residual, runs as one fused
    kernel (ops.fused_mlp) — hidden activations never touch HBM.
    """

    hidden_features: int
    out_features: int
    drop: float = 0.0
    impl: str = "xla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None,
                 residual: bool = False, return_params: bool = False):
        from motionbert_tpu.ops.attention import layer_norm
        from motionbert_tpu.ops.fused_mlp import fused_mlp_block

        C = x.shape[-1]
        if return_params:
            # declare fc1/fc2 (same tree layout) and hand the raw tensors to
            # the caller's pair-fused kernel instead of computing here
            w1, b1 = DenseParams(C, self.hidden_features, name="fc1")()
            w2, b2 = DenseParams(self.hidden_features, self.out_features,
                                 name="fc2")()
            return w1, b1, w2, b2
        # fused path also needs the inter-layer dropout inactive (the
        # reference drops between GELU and fc2, DSTformer.py:79-84) and a
        # lane-aligned channel dim
        # pallas_q8 quantizes only inside the pair kernels; standalone MLP
        # sub-blocks still take the bf16 fused kernel (beats unfused Dense)
        if self.impl in ("pallas", "pallas_q8", "pallas_stream",
                         "pallas_stream_q8") \
                and C % 128 == 0 and \
                (self.drop == 0.0 or deterministic):
            w1, b1 = DenseParams(C, self.hidden_features, name="fc1")()
            w2, b2 = DenseParams(self.hidden_features, self.out_features,
                                 name="fc2")()
            if ln is None:
                ln_s = jnp.ones((C,), jnp.float32)
                ln_b = jnp.zeros((C,), jnp.float32)
            else:
                ln_s, ln_b = ln
            out = fused_mlp_block(
                x.astype(self.dtype), ln_s, ln_b, w1.astype(self.dtype),
                b1.astype(self.dtype), w2.astype(self.dtype),
                b2.astype(self.dtype), ln is not None, residual)
            return nn.Dropout(self.drop)(out, deterministic=deterministic)

        x_in = x
        if ln is not None:
            x = layer_norm(x, *ln)
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        if residual:
            x = x_in + x
        return x


class DenseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's exact param-tree layout but
    returns the raw tensors, so fused kernels can consume them directly
    while checkpoints stay interchangeable with the unfused path."""

    in_features: int
    out_features: int
    use_bias: bool = True
    kernel_init: Any = None  # default: trunc_normal_init()
    bias_init: Any = None    # default: zeros

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel",
                            self.kernel_init or trunc_normal_init(),
                            (self.in_features, self.out_features))
        bias = self.param("bias", self.bias_init or nn.initializers.zeros,
                          (self.out_features,)) if self.use_bias else None
        return kernel, bias


class LNParams(nn.Module):
    """LayerNorm params with nn.LayerNorm's tree layout (scale/bias),
    applied functionally so fused kernels can absorb them."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class Attention(nn.Module):
    """Attention over joints ("spatial"), frames ("temporal"), or the legacy
    variants ("vanilla"/"coupling": all F*J tokens jointly; "series":
    spatial then temporal re-projecting through the same qkv; "parallel":
    both axes fused by a learned per-channel gate).

    Parity: /root/reference/lib/model/DSTformer.py:88-200. qkv is one fused
    projection; scale = head_dim ** -0.5 (DSTformer.py:94). DSTformer's hot
    path only uses spatial/temporal; the legacy modes run on the XLA path.
    """

    dim: int
    num_heads: int
    mode: str  # spatial | temporal | vanilla | coupling | series | parallel
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None,
                 residual: bool = False, return_params: bool = False):
        """ln: optional (scale, bias) of a pre-LayerNorm to absorb;
        residual: add the (pre-LN) input to the output. Both are fused into
        the kernel on the pallas path; the caller (Block) only passes them
        when the stochastic regularizers are inactive. return_params
        declares qkv/proj (same tree layout) and returns the raw tensors
        for the caller's pair-fused kernel instead of computing."""
        from motionbert_tpu.ops.attention import (
            coupled_attention, fused_attention_block, layer_norm)

        B, F, J, C = x.shape
        H = self.num_heads
        d = C // H
        scale = self.qk_scale if self.qk_scale is not None else d ** -0.5

        if self.attn_drop and not deterministic:
            # dropout on the attention WEIGHTS (reference DSTformer.py
            # forward_spatial/forward_temporal) is not implemented — every
            # shipped reference config runs attn_drop_rate=0 (learning.py
            # load_backbone passes none). Training with it set must fail
            # loudly rather than silently regularize differently; eval of
            # such checkpoints is unaffected (dropout is inactive there).
            raise NotImplementedError(
                f"attn_drop_rate={self.attn_drop} is not supported for "
                "training; set it to 0 (all reference configs do)")

        if return_params:
            wqkv, bqkv = DenseParams(C, 3 * C, use_bias=self.qkv_bias,
                                     name="qkv")()
            wproj, bproj = DenseParams(C, C, name="proj")()
            if bqkv is None:
                bqkv = jnp.zeros((3 * C,), wqkv.dtype)
            return wqkv, bqkv, wproj, bproj

        fusable = C % 128 == 0  # Pallas lane alignment
        if self.mode in ("spatial", "temporal") and fusable \
                and self.attn_impl in ("pallas", "pallas_q8", "pallas_stream",
                                       "pallas_stream_q8"):
            # fully fused path: [LN +] qkv matmul + attention +
            # out-projection [+ residual] in one kernel; raw params share
            # nn.Dense's tree layout
            wqkv, bqkv = DenseParams(C, 3 * C, use_bias=self.qkv_bias,
                                     name="qkv")()
            wproj, bproj = DenseParams(C, C, name="proj")()
            if bqkv is None:
                bqkv = jnp.zeros((3 * C,), wqkv.dtype)
            if ln is None:
                ln_s = jnp.ones((C,), jnp.float32)
                ln_b = jnp.zeros((C,), jnp.float32)
            else:
                ln_s, ln_b = ln
            out = fused_attention_block(
                x.astype(self.dtype), ln_s, ln_b, wqkv.astype(self.dtype),
                bqkv.astype(self.dtype), wproj.astype(self.dtype),
                bproj.astype(self.dtype), H, scale, self.mode,
                ln is not None, residual)
            return nn.Dropout(self.proj_drop)(out,
                                              deterministic=deterministic)

        x_in = x
        if ln is not None:
            x = layer_norm(x, *ln)

        qkv_layer = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                             kernel_init=trunc_normal_init(), name="qkv")

        def split_qkv(y):
            # Split along the (lane-contiguous) channel axis — the torch
            # layout packs the 3C output as [q|k|v] each (H, d)
            # (DSTformer.py:113). Heads split inside the attention op;
            # activations stay in the natural (B, F, J, C) layout.
            qkv = qkv_layer(y)
            return (qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:])

        q, k, v = split_qkv(x)
        if self.mode in ("spatial", "temporal", "vanilla"):
            # reference "vanilla" is plain attention over the joint/token
            # axis (DSTformer.py:134-137 routes it to forward_spatial)
            mode = "spatial" if self.mode == "vanilla" else self.mode
            out = st_attention(q, k, v, mode=mode, num_heads=H,
                               scale=scale, impl=self.attn_impl)
        elif self.mode == "coupling":
            out = coupled_attention(q, k, v, num_heads=H, scale=scale)
        elif self.mode == "series":
            # spatial, re-project through the same qkv, then temporal
            # (DSTformer.py:112-118)
            mid = st_attention(q, k, v, mode="spatial", num_heads=H,
                               scale=scale, impl=self.attn_impl)
            q2, k2, v2 = split_qkv(mid)
            out = st_attention(q2, k2, v2, mode="temporal", num_heads=H,
                               scale=scale, impl=self.attn_impl)
        elif self.mode == "parallel":
            # both axes from one qkv, fused by a per-channel softmax gate
            # computed from token-mean features (DSTformer.py:119-129)
            x_t = st_attention(q, k, v, mode="temporal", num_heads=H,
                               scale=scale, impl=self.attn_impl)
            x_s = st_attention(q, k, v, mode="spatial", num_heads=H,
                               scale=scale, impl=self.attn_impl)
            alpha = jnp.concatenate([x_s, x_t], axis=-1)
            alpha = alpha.reshape(B * F, J, 2 * C).mean(axis=1, keepdims=True)
            alpha = nn.Dense(2 * C, dtype=self.dtype,
                             kernel_init=trunc_normal_init(),
                             name="ts_attn")(alpha)
            alpha = jax.nn.softmax(
                alpha.reshape(B * F, 1, C, 2).astype(jnp.float32), axis=-1
            ).astype(self.dtype).reshape(B, F, 1, C, 2)
            out = x_t * alpha[..., 1] + x_s * alpha[..., 0]
        else:
            raise NotImplementedError(self.mode)
        # NOTE: attn_drop (dropout on attention weights) is folded away here
        # because every shipped config runs attn_drop_rate=0 (reference
        # load_backbone, learning.py:83-85 passes no attn_drop).
        out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init(),
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if residual:
            out = x_in + out
        return out


class Block(nn.Module):
    """Pre-LN dual attention+MLP block (reference DSTformer.py:214-267).

    st_mode="stage_st": spatial attn+MLP then temporal attn+MLP;
    st_mode="stage_ts": the reverse order. DropPath on every residual.
    """

    dim: int
    num_heads: int
    st_mode: str  # "stage_st" | "stage_ts" | "stage_para"
    mlp_ratio: float = 4.0
    mlp_out_ratio: float = 1.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    att_fuse: bool = False  # only used by stage_para
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1_s = LNParams(self.dim, name="norm1_s")
        self.norm1_t = LNParams(self.dim, name="norm1_t")
        self.norm2_s = LNParams(self.dim, name="norm2_s")
        self.norm2_t = LNParams(self.dim, name="norm2_t")
        kw = dict(dim=self.dim, num_heads=self.num_heads,
                  qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                  attn_drop=self.attn_drop, proj_drop=self.drop,
                  attn_impl=self.attn_impl, dtype=self.dtype)
        self.attn_s = Attention(mode="spatial", name="attn_s", **kw)
        self.attn_t = Attention(mode="temporal", name="attn_t", **kw)
        hidden = int(self.dim * self.mlp_ratio)
        out_dim = int(self.dim * self.mlp_out_ratio)
        self.mlp_s = Mlp(hidden_features=hidden, out_features=out_dim,
                         drop=self.drop, impl=self.attn_impl,
                         dtype=self.dtype, name="mlp_s")
        self.mlp_t = Mlp(hidden_features=hidden, out_features=out_dim,
                         drop=self.drop, impl=self.attn_impl,
                         dtype=self.dtype, name="mlp_t")
        self.droppath = DropPath(self.drop_path)
        if self.st_mode == "stage_para" and self.att_fuse:
            self.ts_attn = nn.Dense(2 * self.dim, dtype=self.dtype,
                                    kernel_init=trunc_normal_init(),
                                    name="ts_attn")

    def _sub_blocks(self, x, order, deterministic, gate=None):
        """Run attention+MLP sub-blocks in the given axis order.

        When the stochastic regularizers are inactive (eval, or the shipped
        rate-0 configs), the pre-LN and residual fold into the attention
        kernel — and on the pallas path the whole attention+MLP pair runs
        as ONE kernel (ops.fused_pair), so the inter-sub-block activation
        never touches HBM. Otherwise the composition is explicit with
        DropPath.

        gate=(other, wg, bg): apply the layer's att_fuse gate against the
        twin stream `other` after the last sub-block — fused into that
        sub-block's kernel on the pair path, XLA otherwise.
        """
        from motionbert_tpu.ops.attention import layer_norm
        from motionbert_tpu.ops.fused_pair import (
            _gate_xla, fused_gated_pair_block, fused_pair_block)

        dp = lambda y: self.droppath(y, deterministic=deterministic)
        fuse_res = deterministic or (self.drop == 0.0 and
                                     self.drop_path == 0.0)
        C = x.shape[-1]
        hidden = int(self.dim * self.mlp_ratio)
        fusable = fuse_res and C % 128 == 0 and hidden % 128 == 0
        # opt-in whole-stream fusion: both pairs (+ gate) in ONE kernel
        # (ops.fused_stream); falls back to the pair path when the shape
        # preconditions fail
        stream = (fusable and len(order) == 2 and self.attn_impl
                  in ("pallas_stream", "pallas_stream_q8"))
        if stream:
            return self._stream(x, order, gate)
        pair = (fusable and self.attn_impl in
                ("pallas", "pallas_q8", "pallas_stream",
                 "pallas_stream_q8"))
        pair_fn, gated_fn = fused_pair_block, fused_gated_pair_block
        if self.attn_impl in ("pallas_q8", "pallas_stream_q8"):
            # opt-in W8A8 forward (straight-through bf16 backward); see
            # ops.pair_q8 for the quantization scheme and its gating
            from motionbert_tpu.ops.pair_q8 import (
                fused_gated_pair_block_q8, fused_pair_block_q8)
            pair_fn, gated_fn = fused_pair_block_q8, fused_gated_pair_block_q8
        scale = self.qk_scale if self.qk_scale is not None \
            else (C // self.num_heads) ** -0.5
        for i, axis in enumerate(order):
            attn = self.attn_s if axis == "s" else self.attn_t
            mlp = self.mlp_s if axis == "s" else self.mlp_t
            ln1 = (self.norm1_s if axis == "s" else self.norm1_t)()
            ln2 = (self.norm2_s if axis == "s" else self.norm2_t)()
            if pair:
                wqkv, bqkv, wproj, bproj = attn(x, return_params=True)
                w1, b1, w2, b2 = mlp(x, return_params=True)
                dt = self.dtype
                mode = "spatial" if axis == "s" else "temporal"
                if gate is not None and i == len(order) - 1:
                    other, wg, bg = gate
                    x = gated_fn(
                        x.astype(dt), other.astype(dt), ln1[0], ln1[1],
                        wqkv.astype(dt), bqkv.astype(dt), wproj.astype(dt),
                        bproj.astype(dt), ln2[0], ln2[1], w1.astype(dt),
                        b1.astype(dt), w2.astype(dt), b2.astype(dt),
                        wg.astype(dt), bg.astype(dt), self.num_heads,
                        scale, mode)
                    return x
                x = pair_fn(
                    x.astype(dt), ln1[0], ln1[1], wqkv.astype(dt),
                    bqkv.astype(dt), wproj.astype(dt), bproj.astype(dt),
                    ln2[0], ln2[1], w1.astype(dt), b1.astype(dt),
                    w2.astype(dt), b2.astype(dt), self.num_heads, scale,
                    mode)
            elif fuse_res:
                x = attn(x, deterministic, ln=ln1, residual=True)
                x = mlp(x, deterministic, ln=ln2, residual=True)
            else:
                x = x + dp(attn(x, deterministic, ln=ln1))
                x = x + dp(mlp(layer_norm(x, *ln2), deterministic))
        if gate is not None:
            other, wg, bg = gate
            x = _gate_xla(other.astype(x.dtype), x, wg, bg)
        return x

    def _stream(self, x, order, gate):
        """Whole-stream fusion: both of this block's attention+MLP pairs
        (and the optional att_fuse gate) in one Pallas kernel — the
        inter-pair activation never touches HBM (ops.fused_stream). The
        _q8 impl additionally runs the projections W8A8 (ops.pair_q8's
        scheme) with a straight-through bf16 backward."""
        from motionbert_tpu.ops import fused_stream as fs

        if self.attn_impl == "pallas_stream_q8":
            stream_fn = fs.fused_stream_block_q8
            gated_fn = fs.fused_gated_stream_block_q8
        else:
            stream_fn = fs.fused_stream_block
            gated_fn = fs.fused_gated_stream_block

        C = x.shape[-1]
        scale = self.qk_scale if self.qk_scale is not None \
            else (C // self.num_heads) ** -0.5
        dt = self.dtype
        ps = []
        for axis in order:
            attn = self.attn_s if axis == "s" else self.attn_t
            mlp = self.mlp_s if axis == "s" else self.mlp_t
            ln1 = (self.norm1_s if axis == "s" else self.norm1_t)()
            ln2 = (self.norm2_s if axis == "s" else self.norm2_t)()
            wqkv, bqkv, wproj, bproj = attn(x, return_params=True)
            w1, b1, w2, b2 = mlp(x, return_params=True)
            ps += [ln1[0], ln1[1], wqkv.astype(dt), bqkv.astype(dt),
                   wproj.astype(dt), bproj.astype(dt), ln2[0], ln2[1],
                   w1.astype(dt), b1.astype(dt), w2.astype(dt),
                   b2.astype(dt)]
        if gate is not None:
            other, wg, bg = gate
            return gated_fn(
                x.astype(dt), other.astype(dt), *ps, wg.astype(dt),
                bg.astype(dt), self.num_heads, scale, tuple(order))
        return stream_fn(x.astype(dt), *ps, self.num_heads,
                         scale, tuple(order))

    def __call__(self, x, deterministic: bool = True, gate=None):
        from motionbert_tpu.ops.attention import layer_norm

        dp = lambda y: self.droppath(y, deterministic=deterministic)
        if self.st_mode == "stage_st":
            x = self._sub_blocks(x, ("s", "t"), deterministic, gate=gate)
        elif self.st_mode == "stage_ts":
            x = self._sub_blocks(x, ("t", "s"), deterministic, gate=gate)
        elif self.st_mode == "stage_para":
            # legacy in-block parallel branches with optional per-channel
            # gate (reference DSTformer.py:250-264; DSTformer itself fuses
            # at the top level instead)
            x_t = x + dp(self.attn_t(layer_norm(x, *self.norm1_t()),
                                     deterministic))
            x_t = x_t + dp(self.mlp_t(layer_norm(x_t, *self.norm2_t()),
                                      deterministic))
            x_s = x + dp(self.attn_s(layer_norm(x, *self.norm1_s()),
                                     deterministic))
            x_s = x_s + dp(self.mlp_s(layer_norm(x_s, *self.norm2_s()),
                                      deterministic))
            if self.att_fuse:
                alpha = jnp.concatenate([x_s, x_t], axis=-1)
                alpha = self.ts_attn(alpha)
                B, F, J, C2 = alpha.shape
                alpha = jax.nn.softmax(
                    alpha.reshape(B, F, J, C2 // 2, 2).astype(jnp.float32),
                    axis=-1).astype(self.dtype)
                x = x_t * alpha[..., 1] + x_s * alpha[..., 0]
            else:
                x = (x_s + x_t) * 0.5
        else:
            raise NotImplementedError(self.st_mode)
        return x


class DSTformer(nn.Module):
    """The MotionBERT backbone. Input (B, F, J, dim_in) -> (B, F, J, dim_out),
    or the (B, F, J, dim_rep) motion representation with return_rep=True
    (the public `get_representation` contract, reference DSTformer.py:360).
    """

    dim_in: int = 3
    dim_out: int = 3
    dim_feat: int = 256
    dim_rep: int = 512
    depth: int = 5
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_joints: int = 17
    maxlen: int = 243
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    att_fuse: bool = True
    attn_impl: str = "xla"
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)
    collect_attn: bool = False  # sow per-layer gate stats (see count_attn)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.joints_embed = nn.Dense(self.dim_feat, dtype=self.dtype,
                                     kernel_init=trunc_normal_init(),
                                     name="joints_embed")
        self.pos_drop = nn.Dropout(self.drop_rate)
        # stochastic-depth decay rule (reference DSTformer.py:279)
        import numpy as np
        dpr = [float(x) for x in
               np.linspace(0, self.drop_path_rate, self.depth)]
        kw = dict(dim=self.dim_feat, num_heads=self.num_heads,
                  mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                  qk_scale=self.qk_scale, drop=self.drop_rate,
                  attn_drop=self.attn_drop_rate, attn_impl=self.attn_impl,
                  dtype=self.dtype)
        self.blocks_st = [
            Block(st_mode="stage_st", drop_path=dpr[i], **kw)
            for i in range(self.depth)
        ]
        self.blocks_ts = [
            Block(st_mode="stage_ts", drop_path=dpr[i], **kw)
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        if self.dim_rep:
            self.pre_logits = nn.Dense(self.dim_rep, dtype=self.dtype,
                                       kernel_init=trunc_normal_init(),
                                       name="pre_logits")
        if self.dim_out > 0:
            self.head = nn.Dense(self.dim_out, dtype=self.dtype,
                                 kernel_init=trunc_normal_init(), name="head")
        self.temp_embed = self.param(
            "temp_embed", trunc_normal_init(),
            (1, self.maxlen, 1, self.dim_feat))
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init(),
            (1, self.num_joints, self.dim_feat))
        if self.att_fuse:
            # Gate init: zero weight, 0.5 bias (reference DSTformer.py:309-311).
            # Raw params (nn.Dense tree layout) so the gate can run as two
            # half-kernel matmuls instead of materializing a (B,F,J,2C)
            # concat in HBM (measured ~8% of forward time at flagship dims).
            self.ts_attn = [
                DenseParams(2 * self.dim_feat, 2,
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.constant(0.5))
                for _ in range(self.depth)
            ]

    def __call__(self, x, return_rep: bool = False,
                 deterministic: bool = True):
        B, F, J, C_in = x.shape
        x = x.astype(self.dtype)
        x = self.joints_embed(x)                       # (B, F, J, C)
        x = x + self.pos_embed.astype(self.dtype)
        x = x + self.temp_embed[:, :F].astype(self.dtype)
        x = self.pos_drop(x, deterministic=deterministic)

        for idx in range(self.depth):
            if self.remat:
                run = nn.remat(
                    lambda blk, y: blk(y, deterministic),
                    static_argnums=())
                run_gated = nn.remat(
                    lambda blk, y, other, wg, bg: blk(
                        y, deterministic, gate=(other, wg, bg)),
                    static_argnums=())
            else:
                run = lambda blk, y: blk(y, deterministic)
                run_gated = lambda blk, y, other, wg, bg: blk(
                    y, deterministic, gate=(other, wg, bg))
            x_st = run(self.blocks_st[idx], x)
            if self.att_fuse and not self.collect_attn:
                # the gate rides the ts-branch's last sub-block: fused into
                # its pair kernel on the pallas path, a concat-free
                # split-matmul (st @ W[:C] + ts @ W[C:]) otherwise
                wg, bg = self.ts_attn[idx]()
                x = run_gated(self.blocks_ts[idx], x, x_st, wg, bg)
            elif self.att_fuse:
                x_ts = run(self.blocks_ts[idx], x)
                wg, bg = self.ts_attn[idx]()
                Cf = self.dim_feat
                alpha = (x_st @ wg[:Cf].astype(self.dtype)
                         + x_ts @ wg[Cf:].astype(self.dtype)
                         + bg.astype(self.dtype))       # (B, F, J, 2)
                alpha = jax.nn.softmax(
                    alpha.astype(jnp.float32), axis=-1).astype(self.dtype)
                # functional twin of the reference's dormant count_attn
                # hook (DSTformer.py:202-212): per-sample mean gate weight
                # for the two streams, sown per layer; read back with
                # apply(..., mutable=["intermediates"]) or via
                # attention_gate_stats below
                self.sow("intermediates", "gate_alpha",
                         jnp.mean(alpha.astype(jnp.float32),
                                  axis=(1, 2)))  # (B, 2)
                x = x_st * alpha[..., 0:1] + x_ts * alpha[..., 1:2]
            else:
                x_ts = run(self.blocks_ts[idx], x)
                x = (x_st + x_ts) * 0.5
        x = self.norm(x)
        if self.dim_rep:
            x = jnp.tanh(self.pre_logits(x))           # (B, F, J, dim_rep)
        if return_rep:
            return x
        if self.dim_out > 0:
            x = self.head(x)
        return x

    def get_representation(self, x, deterministic: bool = True):
        return self(x, return_rep=True, deterministic=deterministic)

    @nn.nowrap
    def reset_classifier(self, dim_out: int) -> "DSTformer":
        """Return a copy with a new output head size (params must be
        re-initialized/merged by the caller; reference DSTformer.py:325-327).
        nowrap: a plain constructor helper, not a module method — it must
        stay callable on an unbound module outside init/apply."""
        return self.copy(dim_out=dim_out)


def attention_gate_stats(model: "DSTformer", variables, x):
    """Per-sample spatial/temporal gate statistics — the functional
    equivalent of the reference's count_attn accumulator
    (/root/reference/lib/model/DSTformer.py:106-107,202-212).

    Returns {"attn_count_s": (B, depth), "attn_count_t": (B, depth)}: the
    mean gate weight given to the S->T and T->S streams per sample per
    layer. Works with any params; enables stat collection via a copy of the
    model (pure function, no hidden state to reset between batches).
    """
    m = model.copy(collect_attn=True)
    _, inter = m.apply(variables, x, mutable=["intermediates"])
    alphas = inter["intermediates"]["gate_alpha"]  # tuple of (B, 2)
    import numpy as np

    stacked = np.stack([np.asarray(a) for a in alphas], axis=1)  # (B, L, 2)
    return {"attn_count_s": stacked[..., 0], "attn_count_t": stacked[..., 1]}
