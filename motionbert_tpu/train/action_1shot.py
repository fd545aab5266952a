"""One-shot action recognition: SupCon training on NTU120 auxiliary classes,
1-NN cosine evaluation against 20 anchor exemplars.

Behavioral parity target: /root/reference/train_action_1shot.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from motionbert_tpu.losses.supcon import supcon_loss
from motionbert_tpu.train.state import TrainState


def make_supcon_train_step(model, hidden_dim: int, temperature: float):
    @functools.partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, batch_input, batch_gt, rng):
        def loss_fn(params):
            feat = state.apply_fn({"params": params}, batch_input,
                                  deterministic=False,
                                  rngs={"dropout": rng})
            # (bsz, 1, hidden): the reference reshapes the flat batch to
            # (batch_size, -1, hidden_dim) (train_action_1shot.py:193), i.e.
            # every row is its own "anchor" with a single view, and SupCon
            # positives come purely from the label matrix (the
            # MPerClassSampler guarantees n_views same-label rows per batch).
            # tests/test_supcon_step.py pins one full step against a golden.
            feat = feat.reshape(batch_input.shape[0], -1, hidden_dim)
            # base_temperature stays at the reference's 0.07 default: the
            # trainer passes only temperature (train_action_1shot.py:95,
            # loss_supcon.py:15), so the loss scale is temp/0.07 * L
            return supcon_loss(feat, labels=batch_gt,
                               temperature=temperature,
                               base_temperature=0.07)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss

    return train_step


def extract_feats(loader, model, params, mesh=None):
    import numpy as np

    from motionbert_tpu.parallel import padded_eval_batches
    from motionbert_tpu.train.state import memo_step

    def build():
        @jax.jit
        def embed(params, x):
            return model.apply({"params": params}, x, deterministic=True)

        return embed

    # memoized via the shared LRU-bounded step cache (train/state.py)
    embed = memo_step((id(model), model, "embed"), build)

    feats, gts = [], []
    for batch_input, batch_gt, n in padded_eval_batches(loader, mesh):
        feats.append(np.asarray(embed(params, batch_input))[:n])
        gts.append(np.asarray(batch_gt))
    return np.concatenate(feats), np.concatenate(gts)


def validate_1shot(anchor_loader, test_loader, model, params, mesh=None):
    """1-NN cosine-similarity matching (train_action_1shot.py:58-69)."""
    import numpy as np

    train_feats, train_labels = extract_feats(anchor_loader, model, params,
                                              mesh=mesh)
    test_feats, test_labels = extract_feats(test_loader, model, params,
                                            mesh=mesh)

    def _norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                              1e-12)

    sim = _norm(train_feats) @ _norm(test_feats).T  # (M, N)
    pred = train_labels[sim.argmax(axis=0)]
    return float((pred == test_labels).mean())


def train_with_config(args, opts):
    import numpy as np

    from motionbert_tpu.core.cache import enable_compilation_cache
    from motionbert_tpu.core.checkpoint import (
        CheckpointManager, load_any_checkpoint,
        load_pretrained_params)
    from motionbert_tpu.core.logging import MetricsWriter
    from motionbert_tpu.core.metrics import AverageMeter
    from motionbert_tpu.data.dataset_action import (
        MPerClassSampler, NTURGBD, NTURGBD1Shot)
    from motionbert_tpu.data.datasets import BatchLoader
    from motionbert_tpu.parallel import (
        make_mesh, maybe_shard_batch, shard_params)
    from motionbert_tpu.train.action import (
        build_action_model, make_two_group_adamw)

    enable_compilation_cache()
    os.makedirs(opts.checkpoint, exist_ok=True)
    writer = MetricsWriter(os.path.join(opts.checkpoint, "logs"))

    args.model_version = "embed"
    model = build_action_model(args)
    rng = jax.random.PRNGKey(getattr(opts, "seed", 0))
    rng, init_rng = jax.random.split(rng)
    params = model.init(
        init_rng,
        jnp.zeros((1, 2, args.clip_len, args.num_joints, 3)))["params"]

    if args.get("finetune", False) and not (opts.resume or opts.evaluate):
        chk = os.path.join(opts.pretrained, opts.selection)
        print("Loading backbone", chk)
        ckpt_params = load_any_checkpoint(chk)["params"]
        new_backbone, matched, _ = load_pretrained_params(
            params["backbone"], ckpt_params)
        print("load_weight", len(matched))
        params = dict(params, backbone=new_backbone)

    oneshot_path = args.get("data_path_1shot",
                            "data/action/ntu120_hrnet_oneshot.pkl")
    anchor_set = NTURGBD(data_path=oneshot_path, data_split="oneshot_train",
                         n_frames=args.clip_len, random_move=False,
                         scale_range=args.scale_range_test)
    test_set = NTURGBD(data_path=oneshot_path, data_split="oneshot_val",
                       n_frames=args.clip_len, random_move=False,
                       scale_range=args.scale_range_test)
    anchor_loader = BatchLoader(anchor_set, args.batch_size)
    test_loader = BatchLoader(test_set, args.batch_size)

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

    # DP over the device mesh — the reference DataParallel-wraps the
    # one-shot entry point like every other (train_action_1shot.py:98)
    mesh = make_mesh()
    params = shard_params(params, mesh)

    if opts.evaluate:
        acc = validate_1shot(anchor_loader, test_loader, model, params,
                             mesh=mesh)
        print("one-shot 1-NN acc:", acc)
        return {"acc": acc}

    train_path = args.get("data_path", "data/action/ntu120_hrnet.pkl")
    train_set = NTURGBD1Shot(data_path=train_path, data_split="",
                             n_frames=args.clip_len,
                             random_move=args.get("random_move", True),
                             scale_range=args.scale_range_train,
                             check_split=False)
    sampler = MPerClassSampler(train_set.labels, m=args.n_views,
                               batch_size=args.batch_size,
                               length=len(train_set))
    train_loader = BatchLoader(train_set, args.batch_size, sampler=sampler,
                               drop_last=True)

    tx = make_two_group_adamw(args.lr_backbone, args.lr_head,
                              args.weight_decay)
    if args.get("partial_train", None) and args.get("finetune", False) \
            and not opts.resume:
        # the reference applies partial_train only on the fresh-finetune
        # path, and to the backbone alone (train_action_1shot.py:92-93)
        from motionbert_tpu.train.state import freeze_except

        tx = freeze_except(tx, params, args.partial_train, scope="backbone")
    state = TrainState.create(model.apply, params, tx)
    if resume_payload is not None:
        st = resume_payload.get("epoch", 0)
        if resume_payload.get("opt_state") is not None:
            state = state.replace(opt_state=jax.tree_util.tree_map(
                jnp.asarray, resume_payload["opt_state"]))
        best_acc = resume_payload.get("best_metric") or 0.0
        if (resume_payload.get("meta") or {}).get("rng") is not None:
            rng = jnp.asarray(resume_payload["meta"]["rng"])

    train_step = make_supcon_train_step(
        model, args.get("hidden_dim", 2048), args.get("temp", 0.1))
    print(f"INFO: Training on {len(train_loader)} batches")
    print_freq = int(getattr(opts, "print_freq", 100) or 100)
    n_batches = len(train_loader)
    for epoch in range(st, args.epochs):
        print(f"Training epoch {epoch}.")
        train_loader.set_epoch(epoch)  # resume-safe augmentation epoch
        losses = AverageMeter()
        for idx, (batch_input, batch_gt) in enumerate(train_loader):
            rng, sub = jax.random.split(rng)
            bi, bg = maybe_shard_batch(
                (jnp.asarray(batch_input), jnp.asarray(batch_gt)), mesh)
            state, loss = train_step(state, bi, bg, sub)
            losses.update(float(loss), len(batch_input))
            if (idx + 1) % print_freq == 0:  # ref train_action_1shot.py:189
                print(f"Epoch: [{epoch}][{idx + 1}/{n_batches}]\t"
                      f"Loss {losses.val:.4f} ({losses.avg:.4f})", flush=True)
        acc = validate_1shot(anchor_loader, test_loader, model, state.params,
                             mesh=mesh)
        print(f"[{epoch + 1}] supcon {losses.avg:.4f} 1nn_acc {acc:.4f}")
        writer.add_scalar("train_loss_supcon", losses.avg, epoch + 1)
        writer.add_scalar("test_top1", acc, epoch + 1)
        state = state.scale_lr(args.lr_decay)
        improved = acc > best_acc
        best_acc = max(best_acc, acc)
        ckpt_mgr.save_epoch(epoch, float(state.lr or 0), state.params,
                            state.opt_state, best_metric=best_acc,
                            improved=improved,
                            meta={"rng": np.asarray(rng)})
    writer.close()
    return {"acc": best_acc}
