"""On-chip probe for the stream-fused kernel (ops/fused_stream.py): wall
time / achieved TFLOP/s of one whole stream (two pairs + optional gate) vs
the equivalent two pair-kernel launches, at flagship dims, with knob
overrides for the group picker (--budget, --tf, --ks, --kt).

This answers the empirical question the kernel ships opt-in behind: does
removing the intra-stream HBM boundary (37.8 -> 21 MB/clip/layer) beat the
reduced rows-per-matmul the whole-clip VMEM residency forces? Also checks
on-chip numerical equivalence vs the pair composition (the compiled Mosaic
lowering, not just interpret mode).

Timing: iterations chained INSIDE one jit, window closed with a host fetch
(block_until_ready returns early on the axon backend; CLAUDE.md). Best-of-N.

Usage:
    python tools/probe_stream.py                    # default knobs
    python tools/probe_stream.py --budget 29360128  # 28MB picker budget
    python tools/probe_stream.py --ks 4 --kt 4      # force group sizes
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

J, C, H, HID = 17, 512, 8, 1024
SCALE = (C // H) ** -0.5


from _timing import (  # noqa: E402 — canonical window-closing helpers
    fetch_scalar as _fetch, time_chain as _time_chain)


def make_weights(rs, dtype, tag):
    import jax.numpy as jnp

    t = lambda *s: jnp.asarray(rs.randn(*s) * 0.02, dtype)
    one = lambda n: jnp.ones((n,), dtype)
    zero = lambda n: jnp.zeros((n,), dtype)
    return {f"{tag}{k}": v for k, v in dict(
        ln1_s=one(C), ln1_b=zero(C), wqkv=t(C, 3 * C), bqkv=zero(3 * C),
        wproj=t(C, C), bproj=zero(C), ln2_s=one(C), ln2_b=zero(C),
        w1=t(C, HID), b1=zero(HID), w2=t(HID, C), b2=zero(C)).items()}


def _p(w, tag):
    keys = ("ln1_s", "ln1_b", "wqkv", "bqkv", "wproj", "bproj", "ln2_s",
            "ln2_b", "w1", "b1", "w2", "b2")
    return tuple(w[f"{tag}{k}"] for k in keys)


def probe(batch, F, iters, order=("s", "t"), gated=False, q8=False):
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.ops import fused_pair as fp
    from motionbert_tpu.ops import fused_stream as fs
    from motionbert_tpu.ops import pair_q8 as pq

    sfn = fs.fused_stream_block_q8 if q8 else fs.fused_stream_block
    gsfn = fs.fused_gated_stream_block_q8 if q8 \
        else fs.fused_gated_stream_block
    pfn = pq.fused_pair_block_q8 if q8 else fp.fused_pair_block
    gpfn = pq.fused_gated_pair_block_q8 if q8 else fp.fused_gated_pair_block

    rs = np.random.RandomState(0)
    w = {**make_weights(rs, jnp.bfloat16, "a."),
         **make_weights(rs, jnp.bfloat16, "b.")}
    w["wg"] = jnp.asarray(rs.randn(2 * C, 2) * 0.02, jnp.bfloat16)
    w["bg"] = jnp.full((2,), 0.5, jnp.bfloat16)
    x0 = jnp.asarray(rs.randn(batch, F, J, C) * 0.5, jnp.bfloat16)

    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"

    def stream_step(wt, x):
        if gated:
            return gsfn(x, x, *_p(wt, "a."), *_p(wt, "b."), wt["wg"],
                        wt["bg"], H, SCALE, order)
        return sfn(x, *_p(wt, "a."), *_p(wt, "b."), H, SCALE, order)

    def pair_step(wt, x):
        y = pfn(x, *_p(wt, "a."), H, SCALE, mode1)
        if gated:
            return gpfn(y, x, *_p(wt, "b."), wt["wg"], wt["bg"], H, SCALE,
                        mode2)
        return pfn(y, *_p(wt, "b."), H, SCALE, mode2)

    # on-chip equivalence first: a silently-wrong lowering must not be
    # "measured" as a win
    xs = x0[:8]
    a = np.asarray(jax.jit(stream_step)(w, xs), np.float32)
    b = np.asarray(jax.jit(pair_step)(w, xs), np.float32)
    rel = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))
    print(f"stream vs pair rel err (on-chip): {rel:.2e}", flush=True)

    tokens = batch * F * J
    mm = 2 * tokens * (8 * C * C + 4 * C * HID)
    at = tokens * 4 * C * ((fs.STREAM_TF if "s" in order else 0) * J + F)
    flops = mm + at
    out = {"rel_err_vs_pair": rel,
           "groups": fs._pick_stream_groups(F, J, C, HID, 2, gated, q8)}
    for name, step in (("stream", stream_step), ("pair_x2", pair_step)):
        sec = _time_chain(step, w, x0, iters)
        out[name] = dict(ms=round(sec * 1e3, 2),
                         tflops=round(flops / sec / 1e12, 1),
                         clips_per_sec_equiv=round(batch / sec, 1))
        print(f"{name:10s} {out[name]['ms']:8.2f} ms  "
              f"{out[name]['tflops']:6.1f} TF/s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=243)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--order", default="s,t")
    ap.add_argument("--gated", action="store_true")
    ap.add_argument("--q8", action="store_true",
                    help="probe the W8A8 stream kernel vs the q8 pairs")
    ap.add_argument("--budget", type=int, default=None,
                    help="override fused_stream.STREAM_BUDGET (bytes)")
    ap.add_argument("--tf", type=int, default=None,
                    help="override fused_stream.STREAM_TF")
    ap.add_argument("--ks", type=int, default=None,
                    help="force spatial tiles per matmul group")
    ap.add_argument("--kt", type=int, default=None,
                    help="force temporal joints per matmul group")
    args = ap.parse_args()

    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/probe_stream.py")  # tunnel-down => hang (CLAUDE.md)
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from motionbert_tpu.ops import fused_stream as fs

    if args.budget is not None:
        fs.STREAM_BUDGET = args.budget
    if args.tf is not None:
        fs.STREAM_TF = args.tf
    if args.ks is not None or args.kt is not None:
        orig = fs._pick_stream_groups

        def pick(F, J, C, hidden, itemsize, gated, q8=False):
            got = orig(F, J, C, hidden, itemsize, gated, q8)
            if got is None:  # infeasible -> pair-path fallback
                return None
            tf, ks, kt = got
            return (tf, args.ks or ks, args.kt or kt)

        fs._pick_stream_groups = pick
    res = probe(args.batch, args.frames, args.iters,
                tuple(args.order.split(",")), args.gated, args.q8)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
