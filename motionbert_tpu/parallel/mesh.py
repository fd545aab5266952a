"""Device mesh + sharding rules: SPMD data/tensor parallelism via jax.sharding.

The reference's only distribution mechanism is single-process DataParallel
(train.py:257 etc. — replicate module, scatter batch). Here that is a 1-D
"data" mesh axis with the batch dimension sharded and params replicated;
XLA inserts the gradient all-reduce over ICI. A second optional "model"
axis tensor-shards the wide Dense kernels (qkv/proj/MLP, hidden-dim cols)
for scale-out beyond pure DP — not needed for the 42M-param flagship, but
part of the framework's surface (SURVEY.md §2.6).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("data", "model") mesh over the available devices.

    Defaults to all devices on the data axis (pure DP, the reference's
    semantics). n_model > 1 tensor-shards the wide matmuls.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data >= 1 and n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} does not fit {len(devices)} device(s)")
    if n_data * n_model != len(devices):
        # e.g. n_model=3 on 8 devices -> 2x3 mesh, 2 devices idle: training
        # "works" but at 75% capacity — surface it instead of silence
        import warnings
        warnings.warn(
            f"mesh {n_data}x{n_model} uses {n_data * n_model} of "
            f"{len(devices)} devices; the rest sit idle", stacklevel=2)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data"; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a (pytree of) host array(s) with batch sharded over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def maybe_shard_batch(batch, mesh: Optional[Mesh]):
    """shard_batch when a mesh is given AND every leading dim divides the
    data axis; otherwise return the batch unchanged (e.g. an undersized
    validation tail that cannot split evenly)."""
    if mesh is None:
        return batch
    n = mesh.shape["data"]
    leaves = jax.tree_util.tree_leaves(batch)
    if any(x.shape[0] % n != 0 for x in leaves):
        return batch
    return shard_batch(batch, mesh)


def padded_eval_batches(loader, mesh: Optional[Mesh] = None):
    """Iterate an eval loader for a fixed-shape jitted step: yields
    (device_input, batch_gt, n) with the tail batch padded up to the FIRST
    batch's size by repeating its last clip — one compiled shape on TPU
    instead of a fresh trace per tail size — and the input sharded over
    the mesh's data axis when one is given. Callers slice step outputs
    (and the yielded input, if reused) back to [:n].

    Assumes only the final batch can be short (BatchLoader semantics with
    drop_last=False); a single-batch loader is its own canonical shape.
    Shared by all four trainers' validation loops."""
    import jax.numpy as jnp

    full_bs = None
    for batch_input, batch_gt in loader:
        n = batch_input.shape[0]
        full_bs = full_bs or n
        if n < full_bs:
            batch_input = np.concatenate(
                [batch_input, np.repeat(batch_input[-1:], full_bs - n, 0)])
        yield maybe_shard_batch(jnp.asarray(batch_input), mesh), batch_gt, n


# Tensor-parallel partitioning rules for DSTformer-family params: shard the
# hidden/output dimension of the wide kernels over "model". Column-parallel
# for fan-out layers (qkv, fc1), row-parallel for fan-in (proj, fc2) so the
# activation all-reduce happens once per residual branch.
_TP_RULES = [
    (re.compile(r".*(qkv|fc1)/kernel$"), P(None, "model")),
    (re.compile(r".*(qkv|fc1)/bias$"), P("model")),
    (re.compile(r".*(proj|fc2)/kernel$"), P("model", None)),
]


def param_partition_spec(path: str, value) -> P:
    """PartitionSpec for one param, keyed by its flattened path string."""
    for pat, spec in _TP_RULES:
        if pat.match(path):
            # only shard if the dim is divisible; callers check mesh size
            return spec
    return P()


def shard_params(params, mesh: Mesh):
    """Device-put a param pytree with TP rules on the wide kernels.

    With a model axis of size 1 every spec collapses to full replication
    (pure DP). Dimensions not divisible by the model-axis size fall back to
    replication for that param.
    """
    n_model = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path_entries, x):
        path = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path_entries
        )
        spec = param_partition_spec(path, x)
        # check divisibility of sharded dims
        for dim, axis in enumerate(spec):
            if axis == "model" and x.shape[dim] % n_model != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [place(p, v) for p, v in flat])
