"""Export a motionbert_tpu checkpoint back to the reference's torch format.

Lets users round-trip: models trained here load in the PyTorch MotionBERT
codebase (state_dict key layout matches, models/convert.py inverse mapping).

Usage:
    python tools/export_torch.py --ckpt ckpt/best_epoch.ckpt \
        --out ckpt/best_epoch.bin [--model_key model_pos]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def export_torch(ckpt_path: str, out_path: str, model_key: str = "model_pos"):
    import torch

    from motionbert_tpu.core.checkpoint import load_checkpoint
    from motionbert_tpu.models.convert import flax_to_torch_state_dict

    payload = load_checkpoint(ckpt_path)
    variables = {"params": payload["params"]}
    if payload.get("extra_vars"):
        variables.update(payload["extra_vars"])
    sd = flax_to_torch_state_dict(variables)
    torch_sd = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save({
        "epoch": payload.get("epoch", 0),
        "lr": payload.get("lr"),
        model_key: torch_sd,
        "best_metric": payload.get("best_metric"),
    }, out_path)
    print(f"wrote {out_path} ({len(torch_sd)} tensors, key={model_key!r})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model_key", default="model_pos")
    a = p.parse_args()
    export_torch(a.ckpt, a.out, a.model_key)
