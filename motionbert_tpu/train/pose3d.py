"""Pose3D / pretrain task: jitted train + eval steps and the epoch driver.

Behavioral parity target: /root/reference/train.py. One jitted pure
function per step; batch preprocessing (conf split, root-relative targets,
2D corruption) happens on-device inside the step (the reference does this
under no_grad on GPU, train.py:162-172).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from motionbert_tpu.data.augment import NoiseParams, augment2d
from motionbert_tpu.geometry.skeleton import flip_data_jnp
from motionbert_tpu.losses import pose3d_total_loss, loss_2d_weighted
from motionbert_tpu.train.state import TrainState


def preprocess_batch(batch_input, batch_gt, *, rootrel: bool, no_conf: bool,
                     has_3d: bool):
    """Target/input conditioning (reference train.py:163-170)."""
    if no_conf:
        batch_input = batch_input[..., :2]
    conf = None
    if not has_3d:
        conf = batch_gt[..., 2:]  # 2D data: confidence rides the last channel
    if rootrel:
        batch_gt = batch_gt - batch_gt[:, :, 0:1, :]
    else:
        # zero the depth of the first frame's root across the clip
        anchor = batch_gt[:, 0:1, 0:1, 2:3]
        batch_gt = jnp.concatenate(
            [batch_gt[..., :2], batch_gt[..., 2:3] - anchor], axis=-1)
    return batch_input, batch_gt, conf


def make_train_step(model, lambdas: dict, *, rootrel: bool, no_conf: bool,
                    use_mask: bool, use_noise: bool,
                    noise_params: Optional[NoiseParams],
                    mask_ratio: float = 0.0, mask_T_ratio: float = 0.0,
                    flip_aug: bool = False):
    """Build the jitted pose3d train step.

    Returns step(state, batch_input, batch_gt, rng, has_3d, has_gt) with
    has_3d/has_gt static. Metrics are scalars (device arrays).
    """

    @functools.partial(jax.jit, static_argnames=("has_3d", "has_gt"),
                       donate_argnames=("state",))
    def train_step(state: TrainState, batch_input, batch_gt, rng,
                   has_3d: bool = True, has_gt: bool = True):
        rng_flip, rng_aug, rng_drop = jax.random.split(rng, 3)

        if flip_aug:
            # random horizontal flip of input+label jointly (the reference
            # does this per-sample in the dataset, dataset_motion_3d.py:56-58;
            # here it's a batched on-device branch)
            do = jax.random.bernoulli(rng_flip, 0.5,
                                      (batch_input.shape[0], 1, 1, 1))
            batch_input = jnp.where(do, flip_data_jnp(batch_input), batch_input)
            batch_gt = jnp.where(do, flip_data_jnp(batch_gt), batch_gt)

        batch_input, batch_gt, conf = preprocess_batch(
            batch_input, batch_gt, rootrel=rootrel, no_conf=no_conf,
            has_3d=has_3d)
        if use_mask or use_noise:
            batch_input = augment2d(
                rng_aug, batch_input, noise_params,
                noise=(use_noise and has_gt), mask=use_mask,
                mask_ratio=mask_ratio, mask_T_ratio=mask_T_ratio)

        def loss_fn(params):
            pred = state.apply_fn(
                {"params": params}, batch_input, deterministic=False,
                rngs={"dropout": rng_drop})
            pred = pred.astype(jnp.float32)
            if has_3d:
                total, terms = pose3d_total_loss(pred, batch_gt, lambdas)
            else:
                total = loss_2d_weighted(pred, batch_gt, conf)
                terms = {"2d_proj": total, "total": total}
            return total, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        return new_state, terms

    return train_step


def make_eval_step(model, *, no_conf: bool, flip_tta: bool):
    """Flip-averaged inference step (reference train.py:66-72)."""

    @jax.jit
    def eval_step(params, batch_input):
        if no_conf:
            batch_input = batch_input[..., :2]
        pred = model.apply({"params": params}, batch_input)
        if flip_tta:
            pred_flip = model.apply({"params": params},
                                    flip_data_jnp(batch_input))
            pred = (pred + flip_data_jnp(pred_flip)) / 2
        return pred.astype(jnp.float32)

    return eval_step
