"""Probe the chip's achievable ceilings: bf16/int8 matmul TFLOP/s and HBM BW.

Chained-dependency methodology (CLAUDE.md): each iteration consumes the
previous output and the window closes with a host fetch, so async dispatch
cannot fake throughput. Prints one JSON line with the measured ceilings —
used to sanity-check bench.py's MFU numbers, not run by the driver.
"""

import json
import time

import numpy as np


def _fetch(y):
    """Close a timing window with a HOST FETCH of one element.

    On the axon backend block_until_ready can return before the remote
    execution finishes (observed: 0.5ms 'windows' for seconds of compute);
    only a device->host read reliably waits. The stream is serialized, so
    fetching this window's result also drains any queued predecessor."""
    import jax.numpy as jnp

    return float(jnp.ravel(y)[0].astype(jnp.float32))


def timeit(fn, x, reps=3):
    """Seconds per call of fn, best of reps; fn must be self-chaining."""
    x = fn(x)
    _fetch(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(x)
        _fetch(y)
        best = min(best, time.perf_counter() - t0)
    return best


# Inner chain length: one dispatch covers INNER * work, amortizing the
# axon tunnel's per-call RPC overhead (ms-scale) to noise.
INNER = 64


if __name__ == "__main__":
    import sys
    sys.path.insert(0, ".")
    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/probe_peak.py")  # tunnel-down => hang
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0])}

    # --- bf16 matmul peak: z = z @ W chained INNER times inside one jit.
    # W is a jit ARGUMENT, not a closure — closed-over arrays embed as
    # constants the remote compile service re-uploads per program
    n = 4096
    w = jnp.asarray(np.random.RandomState(0).randn(n, n) * 0.01, jnp.bfloat16)

    @jax.jit
    def f(w_, z):
        for _ in range(INNER):
            z = jax.lax.dot(z, w_, preferred_element_type=jnp.bfloat16)
            z = jnp.clip(z, -2, 2)  # keep values finite across the chain
        return z

    t = timeit(lambda z: f(w, z), jnp.ones((n, n), jnp.bfloat16))
    out["bf16_matmul_tflops"] = round(INNER * 2 * n**3 / t / 1e12, 1)

    # --- int8 matmul peak (int32 accumulation)
    wi = jnp.asarray(np.random.RandomState(1).randint(-4, 4, (n, n)), jnp.int8)

    @jax.jit
    def fi(w_, z):
        for _ in range(INNER):
            acc = jax.lax.dot(z, w_, preferred_element_type=jnp.int32)
            z = (acc >> 4).astype(jnp.int8)  # renormalize, keep dependency
        return z

    t = timeit(lambda z: fi(wi, z), jnp.ones((n, n), jnp.int8))
    out["int8_matmul_tops"] = round(INNER * 2 * n**3 / t / 1e12, 1)

    # --- HBM bandwidth: y = y * c over 128 MB, chained (read+write per iter)
    m = 64 * 1024 * 1024  # elements, bf16 -> 128 MB
    # alternate one-ulp-up / one-ulp-down factors: bfloat16(1.0001) rounds
    # to exactly 1.0 and XLA deletes the whole chain (verified in HLO —
    # the probe then times a no-op); the pair keeps y bounded while no
    # factor is algebraically removable
    up = jnp.bfloat16(1.0078125)      # 1 + 2^-7, one bf16 ulp above 1
    down = jnp.bfloat16(0.9921875)    # 1 - 2^-7

    @jax.jit
    def g(y):
        # fori_loop, not an unrolled chain: XLA fuses unrolled elementwise
        # ops into ONE kernel (one read + one write total), which would
        # measure fusion, not bandwidth; the loop body materializes y in
        # HBM every iteration
        def body(i, y):
            return y * jnp.where(i % 2 == 0, up, down)

        return jax.lax.fori_loop(0, INNER, body, y)

    t = timeit(g, jnp.ones((m,), jnp.bfloat16))
    out["hbm_gbps"] = round(INNER * 2 * m * 2 / t / 1e9, 1)

    print(json.dumps(out))
