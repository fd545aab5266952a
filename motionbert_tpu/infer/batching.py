"""Batched inference over variable-length clip lists.

The wild pipelines chunk a video into clip_len windows plus one shorter
tail (data/dataset_wild.py). Running them one-by-one leaves the chip >90%
idle at flagship dims; here same-length clips are grouped into fixed-size
padded batches (one compiled shape per distinct length, tail padded by
repeating the last clip) so the device sees full batches — the reference
gets the same effect from its DataParallel'd DataLoader
(/root/reference/infer_wild.py:33,66-70).
"""

from __future__ import annotations

import numpy as np


def stack_padded(clips, size: int) -> np.ndarray:
    """Stack same-shape (T, ...) clips into a (size, T, ...) batch, padding
    short groups by repeating the last clip (padding rows are dropped by
    unstack_result on the way out)."""
    batch = np.stack(clips)
    if len(clips) < size:
        batch = np.concatenate(
            [batch, np.repeat(batch[-1:], size - len(clips), 0)])
    return batch


def fetch_result(res):
    """ONE device->host transfer per output leaf. Fetch before per-element
    unstacking: slicing a device array per batch element would pay the
    axon backend's ms-scale dispatch RPC once per element per leaf."""
    import jax

    return jax.tree_util.tree_map(np.asarray, res)


def unstack_result(res, k: int):
    """Extract batch element k from a (host-fetched) result pytree as
    writable numpy."""
    import jax

    return jax.tree_util.tree_map(lambda a: np.array(a[k]), res)


def run_batched(clips, batch_size: int, fn):
    """Apply fn((B, T, ...)) -> pytree with leading batch dim over a list of
    (T_i, ...) clips; returns the per-clip results in input order (numpy,
    writable). Clips are grouped by length; undersized groups are padded to
    the group's batch size so each length compiles exactly once."""
    clips = list(clips)
    by_len: dict = {}
    for i, c in enumerate(clips):
        by_len.setdefault(c.shape[0], []).append(i)
    out = [None] * len(clips)
    for _, idxs in sorted(by_len.items(), reverse=True):
        bs = min(batch_size, len(idxs))
        for s in range(0, len(idxs), bs):
            grp = idxs[s:s + bs]
            res = fetch_result(fn(stack_padded([clips[j] for j in grp], bs)))
            for k, j in enumerate(grp):
                out[j] = unstack_result(res, k)
    return out
