"""Canonical on-chip timing helpers for probes/profilers.

Methodology (bench.py `_chain`, CLAUDE.md):
- iterations are chained INSIDE one jit (each output feeds the next
  input via lax.fori_loop) so the per-dispatch RPC overhead of the axon
  tunnel amortizes away;
- every window closes with a HOST FETCH of one element —
  jax.block_until_ready can return before the remote execution finishes
  on this backend (0.5 ms "windows" for seconds of compute);
- aux (weights/params/batches) rides as a jit ARGUMENT, never a closure:
  closed-over arrays embed as constants in the serialized executable and
  the remote compile service re-uploads them per program.

This is the ONE home for the idiom — tools must not re-roll it: two
independent re-rolls drifted into exactly the block_until_ready and
closed-over-params bugs this module exists to prevent.
"""

import time


def fetch_scalar(out):
    """Host fetch of one element; reliably waits for remote execution."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


def time_chain(step, aux, x0, iters, windows=3):
    """Best-of-`windows` seconds per iteration of step(aux, x) -> x,
    `iters` chained inside one jit."""
    import jax

    @jax.jit
    def run(a, x):
        return jax.lax.fori_loop(0, iters, lambda i, y: step(a, y), x)

    fetch_scalar(run(aux, x0))  # compile + warm
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        fetch_scalar(run(aux, x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
