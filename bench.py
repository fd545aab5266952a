"""Throughput benchmark: 243-frame clips/sec/chip for pose3d lifting.

Runs the flagship DSTformer (dim_feat=512, mlp_ratio=2, depth=5 — the
published MotionBERT architecture, configs/pose3d/MB_train_h36m.yaml) in
bf16 inference with the fused Pallas attention path on one chip and prints
ONE JSON line.

Timing methodology: calls are *chained* (each forward consumes the previous
output) and the window ends with a host fetch, so asynchronous dispatch
cannot fake throughput. Best-of-3 windows.

Baseline (vs_baseline denominator): the reference is PyTorch eager fp32 on
A100; no throughput number is published (BASELINE.md). We estimate the A100
reference at ~120 clips/s/chip: the forward pass is ~370 GFLOPs per
243-frame clip (4 attention+MLP pairs per dual layer x 5 depth x 2 streams,
dim 512, 4131 tokens) and torch eager on small-dim transformers sustains
~40-50 TFLOPs on A100. The north-star target (BASELINE.json) is >=5x that,
i.e. vs_baseline >= 5.0.
"""

import json
import time

import numpy as np


A100_REFERENCE_CLIPS_PER_SEC = 120.0


def measure(fwd, variables, x0, iters=5, reps=3):
    out = fwd(variables, x0)
    out.block_until_ready()       # compile + warm (f32 input signature)
    fwd(variables, out).block_until_ready()  # warm the chained bf16 signature
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        x = x0
        for _ in range(iters):
            x = fwd(variables, x)  # chained dependency
        _ = float(x[0, 0, 0, 0])   # host fetch closes the window
        t1 = time.perf_counter()
        best = max(best, x0.shape[0] * iters / (t1 - t0))
    return best


def main():
    from motionbert_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.models.factory import FLAGSHIP_CONFIG

    model = DSTformer(dtype=jnp.bfloat16, attn_impl="pallas",
                      **FLAGSHIP_CONFIG)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 243, 17, 3)))
    fwd = jax.jit(lambda v, x: model.apply(v, x))

    rs = np.random.RandomState(0)
    best, best_batch = 0.0, 0
    for batch in (128,):
        x0 = jnp.asarray(rs.uniform(-1, 1, (batch, 243, 17, 3)), jnp.float32)
        cps = measure(fwd, variables, x0)
        if cps > best:
            best, best_batch = cps, batch

    print(json.dumps({
        "metric": "243-frame clips/sec/chip (pose3d lift)",
        "value": round(best, 2),
        "unit": "clips/s",
        "vs_baseline": round(best / A100_REFERENCE_CLIPS_PER_SEC, 3),
        "detail": {
            "batch": best_batch,
            "dtype": "bfloat16",
            "attn": "pallas-fused",
            "device": str(jax.devices()[0]),
            "baseline_estimate_a100_clips_per_sec": A100_REFERENCE_CLIPS_PER_SEC,
            "target_vs_baseline": 5.0,
        },
    }))


if __name__ == "__main__":
    main()
