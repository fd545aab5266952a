"""Model-level forward profile at the headline batch (VERDICT r4 #7): where
do the last few percent between the in-kernel rate (tools/profile_blocks.py)
and the end-to-end model rate go?

Times the full flagship forward at batch 512 against ablated variants to
attribute the non-kernel glue:
  - depth=0 variant      -> embeds + final norm + pre_logits/tanh + head
  - dim_rep=0 variant    -> isolates pre_logits(512x512)+tanh
  - return_rep variant   -> isolates the 512->3 head
Every window chains iterations inside one jit and closes with a host fetch
(bench._chain methodology — per-call timing undermeasures on the tunneled
chip). Items >=3% of forward are fuse/fold candidates; smaller shavings get
recorded as a closed roofline in docs/design.md.

Run on the real chip:  python tools/profile_forward.py [--batch 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

INNER = 8


def timeit(apply_fn, variables, x, reps=3):
    """Best-of-reps ms for one forward, INNER chained inside one jit with a
    data dependency between iterations, window closed by a host fetch."""
    import jax
    import jax.numpy as jnp

    def chain(v, x0):
        def body(i, carry):
            y = apply_fn(v, carry)
            # fold the output back into the input so iterations serialize
            return carry + 1e-6 * jnp.mean(y).astype(carry.dtype)

        return jax.lax.fori_loop(0, INNER, body, x0)

    run = jax.jit(chain)
    float(jnp.ravel(run(variables, x))[0])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.ravel(run(variables, x))[0])  # host fetch closes window
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(REPO, "data",
                                                  "profile_forward.json"))
    opts = ap.parse_args()

    from motionbert_tpu.core.probe import require_backend

    require_backend(tool="profile_forward")
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.factory import (FLAGSHIP_CONFIG,
                                               default_attn_impl)

    impl = default_attn_impl()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.uniform(-1, 1, (opts.batch, 243, 17, 3)),
                    jnp.bfloat16)

    def build(**overrides):
        cfg = dict(FLAGSHIP_CONFIG, **overrides)
        m = DSTformer(dtype=jnp.bfloat16, attn_impl=impl, **cfg)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 243, 17, 3)))
        return m, v

    out = {"batch": opts.batch, "attn_impl": impl}

    m_full, v_full = build()
    out["full_ms"] = round(timeit(
        lambda v, y: m_full.apply(v, y), v_full, x), 2)

    # trunk-free variant: embeds + norm + pre_logits + head only
    m_d0, v_d0 = build(depth=0)
    out["glue_depth0_ms"] = round(timeit(
        lambda v, y: m_d0.apply(v, y), v_d0, x), 2)

    # pre_logits+tanh isolated: full model minus the rep projection
    m_r0, v_r0 = build(dim_rep=0)
    out["no_prelogits_ms"] = round(timeit(
        lambda v, y: m_r0.apply(v, y), v_r0, x), 2)

    # head isolated: stop at the representation
    out["rep_only_ms"] = round(timeit(
        lambda v, y: m_full.apply(v, y, return_rep=True), v_full, x), 2)

    full = out["full_ms"]
    # a true partition (sums to 100%): marginal pre_logits/head costs from
    # the full-model ablations (clamped at 0 — sub-ms deltas are noise),
    # embeds+final-norm as the depth-0 model minus those two, trunk as the
    # remainder. The depth-0 marginals are geometry-identical to the full
    # model's, so the split is exact up to timer noise.
    prelogits_ms = max(0.0, full - out["no_prelogits_ms"])
    head_ms = max(0.0, full - out["rep_only_ms"])
    embed_norm_ms = max(0.0, out["glue_depth0_ms"] - prelogits_ms - head_ms)
    trunk_ms = full - prelogits_ms - head_ms - embed_norm_ms
    out["attribution_pct"] = {
        "embeds_final_norm": round(100 * embed_norm_ms / full, 1),
        "pre_logits_tanh": round(100 * prelogits_ms / full, 1),
        "head": round(100 * head_ms / full, 1),
        "trunk": round(100 * trunk_ms / full, 1),
    }
    out["clips_per_sec"] = round(opts.batch / (full / 1e3), 1)
    out["measured_at_unix"] = int(time.time())
    os.makedirs(os.path.dirname(opts.out), exist_ok=True)
    with open(opts.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
