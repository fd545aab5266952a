"""Persistent XLA compilation cache setup (big win on the remote-compile
TPU path where each jit compile is an RPC taking tens of seconds)."""

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "MOTIONBERT_COMPILE_CACHE", "/tmp/motionbert_xla_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
