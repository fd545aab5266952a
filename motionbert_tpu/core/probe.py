"""Backend-reachability probe for the tunneled TPU.

With the axon plugin registered and the TPU tunnel down, jax backend
initialization HANGS indefinitely (it never raises, and the plugin ignores
the JAX_PLATFORMS env var) — so any entry point that may touch the backend
unguarded can wedge its whole process. The probe initializes jax in a
THROWAWAY subprocess under a hard timeout instead.

Callers: bench.py (rejects a cpu-only fallback — silently benchmarking the
host would fabricate the chip headline), __graft_entry__.entry() (any
backend will do for a compile check), and the on-chip probe/profile tools
via require_backend().
"""

import subprocess
import sys


def backend_reachable(timeout_s: float = 240.0,
                      reject_cpu_fallback: bool = False) -> bool:
    """True iff a jax backend initializes within timeout_s.

    reject_cpu_fallback=True also treats a cpu-only backend (the plugin
    failing FAST instead of hanging) as unreachable."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
        if proc.returncode != 0:
            return False
        if not reject_cpu_fallback:
            return True
        lines = proc.stdout.strip().splitlines()
        return bool(lines) and lines[-1] != "cpu"
    except subprocess.TimeoutExpired:
        return False


def require_backend(timeout_s: float = 90.0, tool: str = "this tool",
                    reject_cpu_fallback: bool = True) -> None:
    """Exit(2) with a clear message unless an accelerator backend is
    reachable. Every standalone on-chip tool (tools/probe_*.py,
    tools/profile_*.py, tools/verify_kernels.py) calls this FIRST: with
    the axon tunnel down, an unguarded jax import would hang the process
    forever instead of failing."""
    if backend_reachable(timeout_s, reject_cpu_fallback=reject_cpu_fallback):
        return
    sys.stderr.write(
        f"{tool}: no accelerator backend reachable within {timeout_s:.0f}s "
        "(axon tunnel down?) — refusing to initialize jax, which would "
        "hang forever. Retry when `timeout 60 python -c \"import jax; "
        "print(jax.devices())\"` succeeds.\n")
    sys.exit(2)
