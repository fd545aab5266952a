"""On-device numeric verification of the fused Pallas kernels.

Runs the fused attention-block and MLP-block kernels (forward AND custom-VJP
backward) against their XLA reference compositions at flagship dims
(C=512, H=8 — the C%128==0 path that bench.py times) on whatever backend is
active. On TPU this executes the real Mosaic-compiled kernels, catching
miscompiles that interpreter-mode CPU tests cannot see.

bench.py calls verify() before timing and embeds the result; standalone:
    python tools/verify_kernels.py
"""

import json
import sys


def _tree_max_diff(a, b):
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(np.asarray(x, np.float32)
                                         - np.asarray(y, np.float32)))), a, b)
    return max(jax.tree_util.tree_leaves(leaves))


ALL_CHECKS = ("attn_spatial", "attn_temporal", "mlp",
              "pair_spatial", "pair_temporal", "gated_pair")
# what the model actually executes at flagship dims: every block runs as a
# pair kernel (or the gate-fused variant), which contains the attention and
# MLP sub-kernels — so these three cover the full hot path
HOT_PATH_CHECKS = ("pair_spatial", "pair_temporal", "gated_pair")


def verify(batch: int = 4, frames: int = 243, joints: int = 17,
           dim: int = 512, heads: int = 8, tol: float = 0.02,
           checks=ALL_CHECKS):
    """Compare fused vs XLA forward and grads. Returns a report dict;
    raises AssertionError on mismatch beyond tol (relative to output RMS).

    checks selects which kernels to verify — bench.py passes
    HOT_PATH_CHECKS to bound its wall-clock on the slow remote-compile
    path; the standalone CLI runs everything."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionbert_tpu.ops.attention import (
        fused_attention_block, _fused_block_xla)
    from motionbert_tpu.ops.fused_mlp import fused_mlp_block, _fused_mlp_xla
    from motionbert_tpu.ops.fused_pair import (
        _gated_pair_xla, _pair_xla, fused_gated_pair_block, fused_pair_block)

    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    C = dim
    x = jnp.asarray(rs.randn(batch, frames, joints, C) * 0.5, dt)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * rs.randn(C), jnp.float32)
    wqkv = jnp.asarray(rs.randn(C, 3 * C) / np.sqrt(C), dt)
    bqkv = jnp.asarray(0.01 * rs.randn(3 * C), dt)
    wproj = jnp.asarray(rs.randn(C, C) / np.sqrt(C), dt)
    bproj = jnp.asarray(0.01 * rs.randn(C), dt)
    w1 = jnp.asarray(rs.randn(C, 2 * C) / np.sqrt(C), dt)
    b1 = jnp.asarray(0.01 * rs.randn(2 * C), dt)
    w2 = jnp.asarray(rs.randn(2 * C, C) / np.sqrt(2 * C), dt)
    b2 = jnp.asarray(0.01 * rs.randn(C), dt)
    scale = (C // heads) ** -0.5

    report = {}

    def check(name, fused_fn, ref_fn, args):
        if name not in checks:
            return
        # forward: both bf16 paths must sit within a few bf16 ulps (scaled
        # by output magnitude) of each other AND of an fp32 ground truth —
        # the fp32 anchor stops a symmetric miscompile from hiding.
        out_f = jax.jit(fused_fn)(*args)
        out_r = jax.jit(ref_fn)(*args)
        args32 = tuple(a.astype(jnp.float32) for a in args)
        out_32 = jax.jit(ref_fn)(*args32)
        amax = float(jnp.max(jnp.abs(out_32)))
        fwd_diff = _tree_max_diff(out_f, out_r)
        fwd_vs32 = _tree_max_diff(out_f, out_32)
        # backward: grads of a scalar projection wrt every input. The
        # cotangent rides as an ARGUMENT — closed-over arrays embed as
        # executable constants the remote compile service re-uploads
        cot = jnp.asarray(rs.randn(*out_r.shape), jnp.float32)

        def loss(fn):
            return lambda c, *a: jnp.sum(fn(*a).astype(jnp.float32) * c)

        n = len(args)
        grads = jax.jit(jax.grad(loss(fused_fn),
                                 argnums=tuple(range(1, n + 1))))
        g_f = grads(cot, *args)
        g_32 = jax.jit(jax.grad(loss(ref_fn),
                                argnums=tuple(range(1, n + 1))))(cot, *args32)
        g_amax = max(float(jnp.max(jnp.abs(g))) for g in g_32)
        bwd_diff = _tree_max_diff(g_f, g_32)
        report[name] = {"fwd_max_diff": round(fwd_diff, 5),
                        "fwd_vs_fp32": round(fwd_vs32, 5),
                        "out_max": round(amax, 3),
                        "bwd_vs_fp32": round(bwd_diff, 5),
                        "grad_max": round(g_amax, 3)}
        # bf16 ulp at magnitude m is m * 2^-8; allow a handful of ulps
        assert fwd_diff < tol * max(amax, 1.0), (
            f"{name} fused-vs-xla forward mismatch: {fwd_diff}, max {amax}")
        assert fwd_vs32 < tol * max(amax, 1.0), (
            f"{name} fused-vs-fp32 forward mismatch: {fwd_vs32}, max {amax}")
        assert bwd_diff < tol * max(g_amax, 1.0), (
            f"{name} fused-vs-fp32 grad mismatch: {bwd_diff}, max {g_amax}")

    for mode in ("spatial", "temporal"):
        check(
            f"attn_{mode}",
            lambda x, ls, lb, wq, bq, wp, bp, m=mode: fused_attention_block(
                x, ls, lb, wq, bq, wp, bp, heads, scale, m, True, True),
            lambda x, ls, lb, wq, bq, wp, bp, m=mode: _fused_block_xla(
                x, ls, lb, wq, bq, wp, bp, heads, scale, m, True, True),
            (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj))

    check(
        "mlp",
        lambda x, ls, lb, w1, b1, w2, b2: fused_mlp_block(
            x, ls, lb, w1, b1, w2, b2, True, True),
        lambda x, ls, lb, w1, b1, w2, b2: _fused_mlp_xla(
            x, ls, lb, w1, b1, w2, b2, True, True),
        (x, ln_s, ln_b, w1, b1, w2, b2))

    # the hot path: attention+MLP pair and the gate-fused variant
    pair_args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, ln_s, ln_b,
                 w1, b1, w2, b2)
    wg = jnp.asarray(0.05 * rs.randn(2 * C, 2), dt)
    bg = jnp.asarray([0.5, 0.5], dt)
    other = jnp.asarray(rs.randn(batch, frames, joints, C) * 0.5, dt)
    for mode in ("spatial", "temporal"):
        check(
            f"pair_{mode}",
            lambda *a, m=mode: fused_pair_block(*a, heads, scale, m),
            lambda *a, m=mode: _pair_xla(*a, heads, scale, m),
            pair_args)
    check(
        "gated_pair",
        lambda *a: fused_gated_pair_block(*a, heads, scale, "spatial"),
        lambda *a: _gated_pair_xla(*a, heads, scale, "spatial"),
        (x, other, *pair_args[1:], wg, bg))

    report["status"] = "pass"
    return report


# last successful on-chip verification, for bench.py to fall back on when
# a live run exceeds its time budget (slow compile service)
RESULT_CACHE = "/tmp/motionbert_kernel_parity.json"


if __name__ == "__main__":
    import time

    sys.path.insert(0, ".")
    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/verify_kernels.py")  # tunnel-down => hang
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    checks = ALL_CHECKS
    if "--hot-path" in sys.argv:  # bench.py's bounded in-run verification
        checks = HOT_PATH_CHECKS
    batch = 2 if "--hot-path" in sys.argv else 4
    report = verify(batch=batch, checks=checks)
    if report.get("status") == "pass":
        try:
            with open(RESULT_CACHE, "w") as f:
                json.dump(dict(report, verified_at_unix=time.time()), f)
        except OSError:
            pass
    print(json.dumps(report))
