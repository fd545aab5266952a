"""On-chip probe for the fused pair kernels: fwd / fwd+bwd wall time and
achieved TFLOP/s at flagship dims, per mode (spatial/temporal) and variant
(pair/gated), optionally forcing the batch-block size bb.

Timing: iterations chained INSIDE one jit (the output feeds the next
input), window closed with a host fetch of one element — block_until_ready
returns early on the axon backend and per-call windows measure dispatch
(CLAUDE.md). Best-of-N windows.

Usage:
    python tools/probe_pair.py                  # all variants, picker bb
    python tools/probe_pair.py --bb 2           # force bb
    python tools/probe_pair.py --batch 128 --iters 8
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


def make_weights(rs, dtype):
    import jax.numpy as jnp

    t = lambda *s: jnp.asarray(rs.randn(*s) * 0.02, dtype)
    one = lambda n: jnp.ones((n,), dtype)
    zero = lambda n: jnp.zeros((n,), dtype)
    return dict(
        ln1_s=one(C), ln1_b=zero(C), wqkv=t(C, 3 * C), bqkv=zero(3 * C),
        wproj=t(C, C), bproj=zero(C), ln2_s=one(C), ln2_b=zero(C),
        w1=t(C, HID), b1=zero(HID), w2=t(HID, C), b2=zero(C),
        wg=t(2 * C, 2), bg=zero(2))


def probe(batch, F, iters, force_bb=None, modes=("spatial", "temporal"),
          variants=("pair", "gated"), dirs=("fwd", "fwdbwd")):
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.ops import fused_pair as fp

    if force_bb is not None:
        fp._pick_pair_batch_block = lambda *a, **k: force_bb
        fp._pick_pair_bwd_batch_block = lambda *a, **k: min(force_bb, 2) \
            if force_bb else force_bb

    rs = np.random.RandomState(0)
    w = make_weights(rs, jnp.bfloat16)
    x0 = jnp.asarray(rs.randn(batch, F, J, C) * 0.5, jnp.bfloat16)

    tokens = batch * F * J
    results = {}
    for mode in modes:
        # spatial context = the actual frame-tile's row count (counts the
        # block-diagonal tile's masked work as computed, which it is)
        nctx = fp.SPATIAL_TF * J if mode == "spatial" else F
        mm_flops = tokens * (8 * C * C + 4 * C * HID)
        at_flops = tokens * 4 * nctx * C
        fwd_flops = mm_flops + at_flops
        for variant in variants:
            if variant in ("pair_q8", "gated_q8"):
                from motionbert_tpu.ops import pair_q8 as q8
            if variant == "pair":
                def fwd_step(wt, x, mode=mode):
                    return fp.fused_pair_block(
                        x, wt["ln1_s"], wt["ln1_b"], wt["wqkv"], wt["bqkv"],
                        wt["wproj"], wt["bproj"], wt["ln2_s"], wt["ln2_b"],
                        wt["w1"], wt["b1"], wt["w2"], wt["b2"], H, SCALE,
                        mode)
            elif variant == "pair_q8":
                def fwd_step(wt, x, mode=mode):
                    return q8.fused_pair_block_q8(
                        x, wt["ln1_s"], wt["ln1_b"], wt["wqkv"], wt["bqkv"],
                        wt["wproj"], wt["bproj"], wt["ln2_s"], wt["ln2_b"],
                        wt["w1"], wt["b1"], wt["w2"], wt["b2"], H, SCALE,
                        mode)
            elif variant == "gated_q8":
                def fwd_step(wt, x, mode=mode):
                    return q8.fused_gated_pair_block_q8(
                        x, x, wt["ln1_s"], wt["ln1_b"], wt["wqkv"],
                        wt["bqkv"], wt["wproj"], wt["bproj"], wt["ln2_s"],
                        wt["ln2_b"], wt["w1"], wt["b1"], wt["w2"], wt["b2"],
                        wt["wg"], wt["bg"], H, SCALE, mode)
            else:
                def fwd_step(wt, x, mode=mode):
                    return fp.fused_gated_pair_block(
                        x, x, wt["ln1_s"], wt["ln1_b"], wt["wqkv"],
                        wt["bqkv"], wt["wproj"], wt["bproj"], wt["ln2_s"],
                        wt["ln2_b"], wt["w1"], wt["b1"], wt["w2"], wt["b2"],
                        wt["wg"], wt["bg"], H, SCALE, mode)

            for d in dirs:
                if d == "fwd":
                    step = fwd_step
                    flops = fwd_flops
                else:
                    def step(wt, x, fs=fwd_step):
                        out, vjp = jax.vjp(lambda y: fs(wt, y), x)
                        return vjp(out)[0]
                    # fwd + (recompute-fwd + 2x fwd) backward
                    flops = 4 * fwd_flops
                sec = _time_chain(step, w, x0, iters)
                key = f"{mode}/{variant}/{d}"
                results[key] = dict(
                    ms=round(sec * 1e3, 2),
                    tflops=round(flops / sec / 1e12, 1),
                    clip_equiv_us=round(sec / batch * 1e6, 1))
                print(f"{key:28s} {results[key]['ms']:8.2f} ms  "
                      f"{results[key]['tflops']:6.1f} TF/s", flush=True)
    return results


def check_q8(batch=8, F=243):
    """q8 vs fp32-anchor forward error at flagship dims (on-chip), with the
    bf16 kernel's own error as the comparison scale."""
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.ops import fused_pair as fp
    from motionbert_tpu.ops import pair_q8 as q8

    rs = np.random.RandomState(0)
    w16 = make_weights(rs, jnp.bfloat16)
    w32 = {k: v.astype(jnp.float32) for k, v in w16.items()}
    x16 = jnp.asarray(rs.randn(batch, F, J, C) * 0.5, jnp.bfloat16)
    x32 = x16.astype(jnp.float32)
    out = {}
    for mode in ("spatial", "temporal"):
        a = lambda wt, x: (x, wt["ln1_s"], wt["ln1_b"], wt["wqkv"],
                           wt["bqkv"], wt["wproj"], wt["bproj"], wt["ln2_s"],
                           wt["ln2_b"], wt["w1"], wt["b1"], wt["w2"],
                           wt["b2"])
        ref = jax.jit(lambda wt, x, m=mode: fp._pair_xla(*a(wt, x), H,
                                                         SCALE, m))
        f16 = jax.jit(lambda wt, x, m=mode: fp.fused_pair_block(
            *a(wt, x), H, SCALE, m))
        f8 = jax.jit(lambda wt, x, m=mode: q8.fused_pair_block_q8(
            *a(wt, x), H, SCALE, m))
        r = np.asarray(ref(w32, x32), np.float32)
        d16 = np.abs(np.asarray(f16(w16, x16), np.float32) - r).max()
        d8 = np.abs(np.asarray(f8(w16, x16), np.float32) - r).max()
        out[mode] = dict(out_absmax=round(float(np.abs(r).max()), 3),
                         bf16_vs_fp32=round(float(d16), 5),
                         q8_vs_fp32=round(float(d8), 5))
        print(mode, out[mode], flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=243)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bb", type=int, default=None)
    ap.add_argument("--modes", default="spatial,temporal")
    ap.add_argument("--variants", default="pair,gated")
    ap.add_argument("--dirs", default="fwd,fwdbwd")
    ap.add_argument("--check-q8", action="store_true")
    ap.add_argument("--tf", type=int, default=None,
                    help="override the forward spatial frame-tile "
                         "(ops/fused_pair.SPATIAL_TF) for this probe")
    ap.add_argument("--tf-bwd", type=int, default=None,
                    help="override the backward spatial frame-tile "
                         "(ops/fused_pair.SPATIAL_TF_BWD)")
    args = ap.parse_args()

    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="tools/probe_pair.py")  # tunnel-down => hang (CLAUDE.md)
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.tf is not None or args.tf_bwd is not None:
        from motionbert_tpu.ops import fused_pair as fp

        if args.tf is not None:
            fp.SPATIAL_TF = args.tf
        if args.tf_bwd is not None:
            fp.SPATIAL_TF_BWD = args.tf_bwd
    if args.check_q8:
        print(json.dumps(check_q8()))
        return
    res = probe(args.batch, args.frames, args.iters, args.bb,
                tuple(args.modes.split(",")),
                tuple(args.variants.split(",")),
                tuple(args.dirs.split(",")))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
