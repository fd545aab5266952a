"""Per-kernel throughput breakdown at flagship dims (B=128, F=243, C=512).

Times each fused block (spatial attn, temporal attn, MLP) and the XLA glue
(embed/gate/LN) separately with in-jit chaining, reporting achieved TFLOP/s
per kernel — shows which kernel sits below the chip's ~115 TFLOP/s matmul
peak and by how much. Diagnostic only; not run by the driver.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import time_chain  # noqa: E402 — canonical window-closing

B, F, J, C, H = 128, 243, 17, 512, 8
TOKENS = B * F * J
INNER = 8


def timeit(step, aux, x):
    """step(aux, y) -> y, chained INNER times in one jit; weights ride in
    aux as jit arguments and the window closes with a host fetch
    (tools/_timing.py — block_until_ready returns early on axon)."""
    return time_chain(step, aux, x, INNER)


def main():
    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/profile_blocks.py")  # tunnel-down => hang (CLAUDE.md)
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.ops.attention import fused_attention_block
    from motionbert_tpu.ops.fused_mlp import fused_mlp_block

    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
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

    out = {}
    wg = jnp.asarray(rs.randn(2 * C, 2) * 0.01, dt)
    bg = jnp.asarray([0.5, 0.5], dt)
    # weights ride as jit ARGUMENTS (aux), not closed-over constants
    aux = dict(ln_s=ln_s, ln_b=ln_b, wqkv=wqkv, bqkv=bqkv, wproj=wproj,
               bproj=bproj, w1=w1, b1=b1, w2=w2, b2=b2, wg=wg, bg=bg)

    def attn_step(a, y, m):
        return fused_attention_block(y, a["ln_s"], a["ln_b"], a["wqkv"],
                                     a["bqkv"], a["wproj"], a["bproj"],
                                     H, scale, m, True, True)

    proj_flops = TOKENS * (2 * C * 3 * C + 2 * C * C)
    for mode, rows in (("spatial", 8 * J), ("temporal", F)):
        t = timeit(lambda a, y, m=mode: attn_step(a, y, m), aux, x)
        score_flops = TOKENS * 4 * rows * C
        out[f"attn_{mode}"] = {
            "ms": round(t * 1e3, 2),
            "tflops": round((proj_flops + score_flops) / t / 1e12, 1),
            "proj_only_tflops": round(proj_flops / t / 1e12, 1),
        }

    def mlp_step(a, y):
        return fused_mlp_block(y, a["ln_s"], a["ln_b"], a["w1"], a["b1"],
                               a["w2"], a["b2"], True, True)

    mlp_flops = TOKENS * 2 * (2 * C * 2 * C)
    t = timeit(mlp_step, aux, x)
    out["mlp"] = {"ms": round(t * 1e3, 2),
                  "tflops": round(mlp_flops / t / 1e12, 1)}

    # XLA glue: the per-layer att_fuse gate (concat -> Dense(2) -> softmax
    # -> mix), measured on two streams
    def gate(a, p, q):
        al = jnp.concatenate([p, q], axis=-1) @ a["wg"] + a["bg"]
        al = jax.nn.softmax(al.astype(jnp.float32), -1).astype(p.dtype)
        return p * al[..., 0:1] + q * al[..., 1:2]

    t = timeit(lambda a, y: gate(a, y, y + 1), aux, x)
    out["gate"] = {"ms": round(t * 1e3, 2)}

    # one full dual layer for reference: 8 fused blocks + gate
    def layer(a, y):
        def branch(y, order):
            for m in order:
                y = attn_step(a, y, m)
                y = mlp_step(a, y)
            return y

        return gate(a, branch(y, ("spatial", "temporal")),
                    branch(y, ("temporal", "spatial")))

    t = timeit(layer, aux, x)
    layer_flops = 2 * (2 * proj_flops + TOKENS * 4 * (8 * J + F) * C
                       + 2 * mlp_flops)
    out["full_layer"] = {"ms": round(t * 1e3, 2),
                         "tflops": round(layer_flops / t / 1e12, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
