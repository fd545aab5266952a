"""Training-step time breakdown at the shipped pose3d geometry (B=32).

Isolates, with in-jit chaining (same methodology as bench.py):
  fwd            — model forward only (bf16, fused pallas path)
  fwd_bwd        — jax.grad of sum(model(x)) — pure model fwd+bwd
  loss_fwd_bwd   — value_and_grad of the real pose3d loss
  full_step      — the shipped train step (flip aug + loss + AdamW)
and the two fused backward kernels individually at flagship dims with
achieved-TFLOP/s accounting (bwd matmul FLOPs = 2x fwd: dx + dw).

Diagnostic only; not run by the driver.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import time_chain  # noqa: E402 — canonical window-closing

B, F, J, C, H = 32, 243, 17, 512, 8
TOKENS = B * F * J
INNER = 8


def chain(step, aux, x0):
    """step(aux, y) -> y chained INNER times in one jit; params/batches
    ride in aux as jit arguments and the window closes with a host fetch
    (tools/_timing.py — block_until_ready returns early on axon)."""
    return time_chain(step, aux, x0, INNER)


def main():
    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/profile_train.py")  # tunnel-down => hang (CLAUDE.md)
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.factory import FLAGSHIP_CONFIG
    from motionbert_tpu.train.pose3d import make_train_step
    from motionbert_tpu.train.state import TrainState, make_adamw

    out = {}
    rs = np.random.RandomState(0)
    model = DSTformer(dtype=jnp.bfloat16, attn_impl="pallas", remat=False,
                      **FLAGSHIP_CONFIG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 243, 17, 3)))["params"]

    gt = jnp.asarray(rs.uniform(-1, 1, (B, 243, 17, 3)), jnp.float32)
    inp = jnp.concatenate(
        [gt[..., :2], jnp.ones((B, 243, 17, 1), jnp.float32)], -1)

    # 1. forward only (self-chained on the input slot; params ride in aux)
    x0 = jnp.asarray(rs.uniform(-1, 1, (B, 243, 17, 3)), jnp.bfloat16)
    sec = chain(lambda p, x: model.apply({"params": p}, x).astype(
        jnp.bfloat16), params, x0)
    out["fwd"] = {"ms": round(sec * 1e3, 1), "clips_per_s": round(B / sec, 1)}

    # 2. model fwd+bwd (grad wrt params of a trivial readout; chained on a
    #    params-perturbation carry so iterations depend on each other; the
    #    input batch rides in aux)
    def g_once(a, p):
        def f(pp):
            return jnp.sum(model.apply({"params": pp}, a).astype(
                jnp.float32))
        g = jax.grad(f)(p)
        return jax.tree.map(lambda x, b: x + 0.0 * b.astype(x.dtype), p, g)

    sec = chain(g_once, inp, params)
    out["fwd_bwd"] = {"ms": round(sec * 1e3, 1),
                      "clips_per_s": round(B / sec, 1)}

    # 3/4. real loss + full step (flip_aug=True: shipped pose3d configs
    # set flip: true, so the profiled step must include the on-device
    # flip branch the trainer runs)
    state = TrainState.create(model.apply, params, make_adamw(5e-4, 0.01))
    step = make_train_step(
        model, dict(lambda_scale=0.5, lambda_3d_velocity=20.0, lambda_lv=0.0,
                    lambda_lg=0.0, lambda_a=0.0, lambda_av=0.0),
        rootrel=True, no_conf=False, use_mask=False, use_noise=False,
        noise_params=None, flip_aug=True)

    def one(a, carry):
        i, g_ = a
        st, r = carry
        r, sub = jax.random.split(r)
        st, _ = step(st, i, g_, sub)
        return (st, r)

    sec = chain(one, (inp, gt), (state, jax.random.PRNGKey(1)))
    out["full_step"] = {"ms": round(sec * 1e3, 1),
                        "clips_per_s": round(B / sec, 1)}

    # 5. fused backward kernels in isolation, flagship dims
    from motionbert_tpu.ops.attention import (
        _fused_block_bwd_pallas, _fused_block_pallas)
    from motionbert_tpu.ops.fused_mlp import _fused_mlp_bwd_pallas

    dt = jnp.bfloat16
    x = jnp.asarray(rs.randn(B, F, J, C) * 0.3, dt)
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rs.randn(C, 3 * C) / np.sqrt(C), dt)
    bqkv = jnp.zeros((3 * C,), dt)
    wproj = jnp.asarray(rs.randn(C, C) / np.sqrt(C), dt)
    bproj = jnp.zeros((C,), dt)
    w1 = jnp.asarray(rs.randn(C, 2 * C) / np.sqrt(C), dt)
    b1 = jnp.zeros((2 * C,), dt)
    w2 = jnp.asarray(rs.randn(2 * C, C) / np.sqrt(2 * C), dt)
    b2 = jnp.zeros((C,), dt)
    scale = (C // H) ** -0.5
    g = jnp.asarray(rs.randn(B, F, J, C) * 0.1, dt)

    proj_flops = TOKENS * (2 * C * 3 * C + 2 * C * C)
    mlp_flops = TOKENS * 2 * (2 * C * 2 * C)
    # kernel weights + cotangent ride as jit ARGUMENTS (aux)
    aux = dict(ln_s=ln_s, ln_b=ln_b, wqkv=wqkv, bqkv=bqkv, wproj=wproj,
               bproj=bproj, w1=w1, b1=b1, w2=w2, g=g)

    for mode, rows in (("spatial", 8 * J), ("temporal", F)):
        def attn_bwd(a, y, m=mode):
            outs = _fused_block_bwd_pallas(
                y, a["ln_s"], a["ln_b"], a["wqkv"], a["bqkv"], a["wproj"],
                H, scale, m, True, True, a["g"])
            return outs[0]

        sec = chain(attn_bwd, aux, x)
        score_flops = TOKENS * 4 * rows * C
        # bwd: recompute fwd (1x) + dx/dw for each matmul (2x)
        fl = 3 * (proj_flops + score_flops)
        out[f"attn_bwd_{mode}"] = {"ms": round(sec * 1e3, 2),
                                   "tflops": round(fl / sec / 1e12, 1)}

    def mlp_bwd(a, y):
        outs = _fused_mlp_bwd_pallas(y, a["ln_s"], a["ln_b"], a["w1"],
                                     a["b1"], a["w2"], True, True, a["g"])
        return outs[0]

    sec = chain(mlp_bwd, aux, x)
    out["mlp_bwd"] = {"ms": round(sec * 1e3, 2),
                      "tflops": round(3 * mlp_flops / sec / 1e12, 1)}

    # forward kernel at the same B for comparison
    def attn_fwd(a, y):
        return _fused_block_pallas(y, a["ln_s"], a["ln_b"], a["wqkv"],
                                   a["bqkv"], a["wproj"], a["bproj"],
                                   H, scale, "temporal", True, True)

    sec = chain(attn_fwd, aux, x)
    fl = proj_flops + TOKENS * 4 * F * C
    out["attn_fwd_temporal_b32"] = {"ms": round(sec * 1e3, 2),
                                    "tflops": round(fl / sec / 1e12, 1)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
