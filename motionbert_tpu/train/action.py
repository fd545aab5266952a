"""Action recognition training (parity: /root/reference/train_action.py)
and one-shot metric learning (train_action_1shot.py).

Two param groups (backbone lr / head lr) via optax.multi_transform; StepLR
(gamma per epoch) via TrainState.scale_lr. BatchNorm stats live in the
batch_stats collection and update inside the jitted step.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from motionbert_tpu.train.state import TrainState


def make_two_group_adamw(lr_backbone, lr_head, weight_decay):
    """AdamW with separate LRs for the 'backbone' and 'head' subtrees
    (reference train_action.py:142-147)."""

    def label_fn(params):
        return {k: ("backbone" if k == "backbone" else "head")
                for k in params}

    inject = lambda lr: optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, weight_decay=weight_decay)
    return optax.multi_transform(
        {"backbone": inject(lr_backbone), "head": inject(lr_head)}, label_fn)


def make_action_train_step(model):
    @functools.partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, batch_input, batch_gt, rng):
        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, **(state.extra_vars or {})},
                batch_input, deterministic=False,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), batch_gt).mean()
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_extra_vars=updates)
        top1 = (logits.argmax(-1) == batch_gt).mean() * 100.0
        top5 = jnp.any(jax.lax.top_k(logits, 5)[1] == batch_gt[:, None],
                       axis=-1).mean() * 100.0
        # scalars only: returning the (N, classes) logits would copy an
        # unused array out of the donated-buffer step every iteration
        return new_state, {"loss": loss, "top1": top1, "top5": top5}

    return train_step


def make_action_eval_step(model):
    from motionbert_tpu.train.state import memo_step

    def build():
        @jax.jit
        def eval_step(params, extra_vars, batch_input):
            logits = model.apply({"params": params, **(extra_vars or {})},
                                 batch_input, deterministic=True)
            return logits.astype(jnp.float32)

        return eval_step

    # memoized via the shared LRU-bounded step cache (train/state.py)
    return memo_step((id(model), model, "action_eval"), build)


def validate(test_loader, model, params, extra_vars, mesh=None):
    """CE loss + top1/top5 over the validation loader
    (reference train_action.py:41-75). With a device mesh, eval batches
    shard over the data axis like training (parity with the reference's
    DataParallel-wrapped validation, train_action.py:44)."""
    import numpy as np

    from motionbert_tpu.core.metrics import AverageMeter, accuracy_topk
    from motionbert_tpu.parallel import padded_eval_batches

    eval_step = make_action_eval_step(model)
    losses, top1, top5 = AverageMeter(), AverageMeter(), AverageMeter()
    for batch_input, batch_gt, n in padded_eval_batches(test_loader, mesh):
        logits = np.asarray(eval_step(params, extra_vars, batch_input))[:n]
        labels = np.asarray(batch_gt)
        ce = -np.take_along_axis(
            logits - _logsumexp(logits), labels[:, None], axis=1).mean()
        a1, a5 = accuracy_topk(logits, labels, topk=(1, 5))
        losses.update(float(ce), n)
        top1.update(a1, n)
        top5.update(a5, n)
    return losses.avg, top1.avg, top5.avg


def _logsumexp(x):
    import numpy as np

    m = x.max(axis=1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=1, keepdims=True))


def build_action_model(args):
    from motionbert_tpu.models.action_heads import ActionNet
    from motionbert_tpu.models.factory import (
        load_backbone)

    backbone = load_backbone(args, remat=args.get("remat", True))
    return ActionNet(
        backbone=backbone, dim_rep=args.dim_rep,
        num_classes=args.get("action_classes", 60),
        dropout_ratio=args.get("dropout_ratio", 0.0),
        version=args.get("model_version", "class"),
        hidden_dim=args.get("hidden_dim", 2048),
        num_joints=args.num_joints)


def train_with_config(args, opts):
    """Epoch driver (parity: reference train_action.py:78-238)."""
    import numpy as np

    from motionbert_tpu.core.cache import enable_compilation_cache
    from motionbert_tpu.core.checkpoint import (
        CheckpointManager, load_any_checkpoint,
        load_pretrained_params)
    from motionbert_tpu.core.logging import MetricsWriter
    from motionbert_tpu.core.metrics import AverageMeter
    from motionbert_tpu.data.dataset_action import NTURGBD
    from motionbert_tpu.data.datasets import BatchLoader
    from motionbert_tpu.parallel import (
        make_mesh, maybe_shard_batch, shard_params)

    enable_compilation_cache()
    os.makedirs(opts.checkpoint, exist_ok=True)
    writer = MetricsWriter(os.path.join(opts.checkpoint, "logs"))

    model = build_action_model(args)
    rng = jax.random.PRNGKey(getattr(opts, "seed", 0))
    rng, init_rng = jax.random.split(rng)
    variables = model.init(
        init_rng, jnp.zeros((1, 2, args.clip_len, args.num_joints, 3)))
    params = variables["params"]
    extra_vars = {k: v for k, v in variables.items() if k != "params"}

    if args.get("finetune", False) and not (opts.resume or opts.evaluate):
        chk = os.path.join(opts.pretrained, opts.selection)
        print("Loading backbone", chk)
        ckpt_params = load_any_checkpoint(chk)["params"]
        # tolerant, backbone-only (reference load_pretrained_weights)
        new_backbone, matched, _ = load_pretrained_params(
            params["backbone"], ckpt_params)
        print("load_weight", len(matched))
        params = dict(params, backbone=new_backbone)

    data_path = args.get("data_path") or f"data/action/{args.dataset}.pkl"
    print("Loading dataset...")
    train_set = NTURGBD(data_path=data_path,
                        data_split=args.data_split + "_train",
                        n_frames=args.clip_len,
                        random_move=args.get("random_move", True),
                        scale_range=args.scale_range_train)
    val_set = NTURGBD(data_path=data_path,
                      data_split=args.data_split + "_val",
                      n_frames=args.clip_len, random_move=False,
                      scale_range=args.scale_range_test)
    train_loader = BatchLoader(train_set, args.batch_size, shuffle=True,
                               drop_last=True)
    test_loader = BatchLoader(val_set, args.batch_size, shuffle=False)

    ckpt_mgr = CheckpointManager(opts.checkpoint,
                                 args.get("checkpoint_frequency", 1))
    best_acc = 0.0
    st = 0
    resume_payload = None
    if ckpt_mgr.has_latest() and not opts.resume and not opts.evaluate:
        opts.resume = ckpt_mgr.latest_path
    if opts.resume or opts.evaluate:
        chk = opts.evaluate or opts.resume
        print("Loading checkpoint", chk)
        resume_payload = load_any_checkpoint(chk)
        params = resume_payload["params"]
        extra_vars = resume_payload.get("extra_vars") or (
            {"batch_stats": resume_payload["batch_stats"]}
            if "batch_stats" in resume_payload else extra_vars)

    mesh = make_mesh()
    params = shard_params(params, mesh)

    if opts.evaluate:
        loss, t1, t5 = validate(test_loader, model, params, extra_vars,
                                mesh=mesh)
        print(f"Loss {loss:.4f} \tAcc@1 {t1:.3f} \tAcc@5 {t5:.3f}")
        return {"top1": t1, "top5": t5}

    tx = make_two_group_adamw(args.lr_backbone, args.lr_head,
                              args.weight_decay)
    if args.get("partial_train", None):
        from motionbert_tpu.train.state import freeze_except

        # backbone-only: the reference leaves the task head trainable
        tx = freeze_except(tx, params, args.partial_train,
                           scope="backbone")
    state = TrainState.create(model.apply, params, tx, extra_vars=extra_vars)
    if resume_payload is not None:
        st = resume_payload.get("epoch", 0)
        if resume_payload.get("opt_state") is not None:
            state = state.replace(opt_state=jax.tree_util.tree_map(
                jnp.asarray, resume_payload["opt_state"]))
        best_acc = resume_payload.get("best_metric") or 0.0
        if (resume_payload.get("meta") or {}).get("rng") is not None:
            rng = jnp.asarray(resume_payload["meta"]["rng"])

    train_step = make_action_train_step(model)
    print(f"INFO: Training on {len(train_loader)} batches")
    print_freq = int(getattr(opts, "print_freq", 100) or 100)
    n_batches = len(train_loader)
    for epoch in range(st, args.epochs):
        print(f"Training epoch {epoch}.")
        train_loader.set_epoch(epoch)  # resume-safe augmentation epoch
        losses = AverageMeter()
        top1 = AverageMeter()
        top5m = AverageMeter()
        for idx, (batch_input, batch_gt) in enumerate(train_loader):
            rng, sub = jax.random.split(rng)
            bi, bg = maybe_shard_batch(
                (jnp.asarray(batch_input), jnp.asarray(batch_gt)), mesh)
            state, m = train_step(state, bi, bg, sub)
            losses.update(float(m["loss"]), len(batch_input))
            top1.update(float(m["top1"]), len(batch_input))
            top5m.update(float(m["top5"]), len(batch_input))
            if (idx + 1) % print_freq == 0:  # reference train_action.py:189
                print(f"Epoch: [{epoch}][{idx + 1}/{n_batches}]\t"
                      f"Loss {losses.val:.4f} ({losses.avg:.4f})\t"
                      f"Acc@1 {top1.avg:.2f}", flush=True)
        test_loss, test_top1, test_top5 = validate(
            test_loader, model, state.params, state.extra_vars, mesh=mesh)
        print(f"[{epoch + 1}] loss {losses.avg:.4f} train_top1 {top1.avg:.2f} "
              f"test_top1 {test_top1:.2f} test_top5 {test_top5:.2f}")
        for tag, v in (("train_loss", losses.avg), ("train_top1", top1.avg),
                       ("train_top5", top5m.avg),
                       ("test_loss", test_loss), ("test_top1", test_top1),
                       ("test_top5", test_top5)):
            writer.add_scalar(tag, v, epoch + 1)
        state = state.scale_lr(args.lr_decay)  # StepLR step_size=1
        improved = test_top1 > best_acc
        best_acc = max(best_acc, test_top1)
        ckpt_mgr.save_epoch(epoch, float(state.lr or 0), state.params,
                            state.opt_state, extra_vars=state.extra_vars,
                            best_metric=best_acc, improved=improved,
                            meta={"rng": np.asarray(rng)})
    writer.close()
    return {"top1": best_acc}
