"""Supervised contrastive loss (Khosla et al. 2020) in jnp.

Behavioral parity target: /root/reference/lib/model/loss_supcon.py:11-98
('all' contrast mode, the variant train_action_1shot.py uses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def supcon_loss(features, labels=None, mask=None, temperature: float = 0.07,
                base_temperature: float = 0.07):
    """features: (bsz, n_views, d) L2-normalized embeddings.

    labels: (bsz,) int — positives are same-label samples; if neither labels
    nor mask given, degenerates to SimCLR (views of the same sample).
    """
    if features.ndim < 3:
        raise ValueError("`features` needs to be [bsz, n_views, ...]")
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)

    bsz, n_views = features.shape[:2]
    if labels is not None and mask is not None:
        raise ValueError("Cannot define both `labels` and `mask`")
    if labels is None and mask is None:
        mask = jnp.eye(bsz, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    # contrast_feature: views stacked along batch (torch.cat(unbind(dim=1)))
    contrast = jnp.concatenate(
        [features[:, v] for v in range(n_views)], axis=0)  # (bsz*V, d)
    anchor = contrast
    anchor_count = n_views

    logits = anchor @ contrast.T / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    n = bsz * anchor_count
    logits_mask = 1.0 - jnp.eye(n, dtype=jnp.float32)  # drop self-contrast
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(exp_logits.sum(axis=1, keepdims=True))
    # guard mask.sum==0 (an anchor with NO positives, e.g. n_views=1 and a
    # batch-unique label): the reference 0/0-NaNs here but its only caller
    # always has 2 views; as a public function the empty-positive anchor
    # must contribute 0, not poison the batch mean with NaN
    mean_log_prob_pos = (mask * log_prob).sum(axis=1) \
        / jnp.maximum(mask.sum(axis=1), 1.0)

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return loss.reshape(anchor_count, bsz).mean()
