"""Running meters and classification metrics.

Equivalent surface to the reference's AverageMeter / accuracy
(/root/reference/lib/utils/learning.py:8-37), in numpy/jnp.
"""

from __future__ import annotations

import numpy as np


class AverageMeter:
    """Tracks current value, running sum, count, and average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def accuracy_topk(logits, labels, topk=(1,)):
    """Top-k accuracy in percent. logits: (N, classes); labels: (N,).

    Same contract as reference accuracy (learning.py:25-37).
    """
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    maxk = max(topk)
    n = labels.shape[0]
    # indices of top-maxk classes, descending; stable sort so tied logits
    # break toward lower class indices like torch.topk (default quicksort
    # orders ties arbitrarily — measurably diverges on saturated logits)
    pred = np.argsort(-logits, axis=1, kind="stable")[:, :maxk]  # (N, maxk)
    correct = pred == labels[:, None]  # (N, maxk)
    return [100.0 * float(correct[:, :k].any(axis=1).sum()) / n for k in topk]
