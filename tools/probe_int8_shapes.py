"""int8-vs-bf16 matmul throughput at the fused pair kernels' actual shapes.

Evidence artifact for the W8A8 decision (VERDICT r2 #1): the chip's int8
ceiling is 173.8 TOPS at 4096^2 (1.47x bf16), but the model's matmuls have
K=512/1024 contractions and a few hundred rows — this sweep records what
int8 actually delivers at those shapes. Chained-dependency + host-fetch
timing (CLAUDE.md).

Each (M, K, N) entry times z(M,K) @ w1(K,N) -> (M,N) @ w2(N,K) -> (M,K)
round trips, so both fan-out and fan-in matmul shapes are covered.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

INNER = 128

# (label, M, K, N)
SHAPES = [
    ("old spatial rows (N=136)", 136, 512, 1536),
    ("old temporal rows (N=243)", 243, 512, 1536),
    ("flattened spatial (bb=4)", 544, 512, 1536),
    ("flattened temporal (bb=2)", 486, 512, 1536),
    ("fc1/fc2 flattened", 544, 512, 1024),
    ("8x rows", 2048, 512, 1536),
    ("square 2048", 2048, 2048, 2048),
    ("square 4096 (ceiling)", 4096, 4096, 4096),
]


def _fetch(y):
    import jax.numpy as jnp

    return float(jnp.ravel(y)[0].astype(jnp.float32))


def timeit(fn, x, *ws, reps=3):
    # weights ride as jit ARGUMENTS (not embedded constants): closed-over
    # arrays serialize into the executable and the tunneled compile
    # service re-uploads them per program (CLAUDE.md)
    x = fn(x, *ws)
    _fetch(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(x, *ws)
        _fetch(y)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/probe_int8_shapes.py")  # tunnel-down => hang (CLAUDE.md)
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    rows = []
    for label, M, K, N in SHAPES:
        w1 = jnp.asarray(rs.randn(K, N) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rs.randn(N, K) * 0.02, jnp.bfloat16)

        @jax.jit
        def f(z, w1, w2):
            for _ in range(INNER):
                m = jax.lax.dot(z, w1, preferred_element_type=jnp.bfloat16)
                z = jnp.clip(
                    jax.lax.dot(m, w2, preferred_element_type=jnp.bfloat16),
                    -2, 2)
            return z

        t = timeit(f, jnp.ones((M, K), jnp.bfloat16), w1, w2)
        bf16 = INNER * 4 * M * K * N / t / 1e12

        w1i = jnp.asarray(rs.randint(-4, 4, (K, N)), jnp.int8)
        w2i = jnp.asarray(rs.randint(-4, 4, (N, K)), jnp.int8)

        @jax.jit
        def fi(z, w1i, w2i):
            for _ in range(INNER):
                acc = jax.lax.dot(z, w1i, preferred_element_type=jnp.int32)
                m = (acc >> 4).astype(jnp.int8)
                acc = jax.lax.dot(m, w2i, preferred_element_type=jnp.int32)
                z = (acc >> 4).astype(jnp.int8)
            return z

        t = timeit(fi, jnp.ones((M, K), jnp.int8), w1i, w2i)
        i8 = INNER * 4 * M * K * N / t / 1e12
        rows.append(dict(shape=f"{M}x{K}x{N}", label=label,
                         bf16_tflops=round(bf16, 1),
                         int8_tops=round(i8, 1),
                         int8_vs_bf16=round(i8 / bf16, 2)))
        print(f"{label:28s} {M:5d}x{K}x{N}: bf16 {bf16:6.1f} TF/s  "
              f"int8 {i8:6.1f} TOPS  ratio {i8/bf16:4.2f}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
