"""Pose3D / pretrain task: jitted train + eval steps and the epoch driver.

Behavioral parity target: /root/reference/train.py. One jitted pure
function per step; batch preprocessing (conf split, root-relative targets,
2D corruption) happens on-device inside the step (the reference does this
under no_grad on GPU, train.py:162-172).
"""

from __future__ import annotations

import functools
import os
import time
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



# Builders are memoized by model identity via the shared LRU-bounded step
# cache (train/state.py::memo_step — see its docstring for why).
from motionbert_tpu.train.state import memo_step as _memo


def make_eval_step(model, *, no_conf: bool, flip_tta: bool):
    """Flip-averaged inference step (reference train.py:66-72)."""
    return _memo((id(model), model, "eval", no_conf, flip_tta),
                 lambda: _build_eval_step(model, no_conf, flip_tta))


def _build_eval_step(model, no_conf, flip_tta):
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


# H36M test videos excluded from evaluation (reference train.py:109-111)
BLOCK_LIST = ("s_09_act_05_subact_02", "s_09_act_10_subact_02",
              "s_09_act_13_subact_01")


def evaluate(args, model, params, test_loader, datareader,
             return_results: bool = False, mesh=None):
    """Full H36M eval protocol (reference train.py:56-153).

    Batched flip-TTA inference -> denormalize to pixels -> per-clip 2.5d
    scaling -> root-relative -> per-frame error accumulation with overlap
    counts -> per-action P1 (MPJPE) / P2 (P-MPJPE) means. With a device
    mesh, eval batches shard over the data axis like training. Returns
    (e1, e2, results_all[, per_action dict]).
    """
    import numpy as np

    from motionbert_tpu.geometry.procrustes import mpjpe, p_mpjpe
    from motionbert_tpu.parallel import padded_eval_batches

    eval_step = make_eval_step(model, no_conf=args.get("no_conf", False),
                               flip_tta=args.get("flip", False))
    results_all = []
    for batch_input, _, n in padded_eval_batches(test_loader, mesh):
        pred = eval_step(params, batch_input)
        pred = np.array(pred[:n])  # writable host copy
        batch_input = batch_input[:n]
        if args.get("rootrel", False):
            pred[:, :, 0, :] = 0
        if args.get("gt_2d", False):
            pred[..., :2] = batch_input[..., :2]
        results_all.append(pred)
    results_all = np.concatenate(results_all)
    e1, e2, per_action = evaluate_predictions(results_all, datareader)
    if return_results:
        return e1, e2, results_all, per_action
    return e1, e2, results_all


def evaluate_predictions(results_all, datareader):
    """Score normalized per-clip predictions with the H36M protocol
    (the aggregation half of reference train.py:83-151)."""
    import numpy as np

    from motionbert_tpu.geometry.procrustes import mpjpe, p_mpjpe

    results_all = datareader.denormalize(results_all)

    _, split_id_test = datareader.get_split_id()
    actions = np.array(datareader.dt_dataset["test"]["action"])
    factors = np.array(datareader.dt_dataset["test"]["2.5d_factor"])
    gts = np.array(datareader.dt_dataset["test"]["joints_2.5d_image"])
    sources = np.array(datareader.dt_dataset["test"]["source"])

    num_test_frames = len(actions)
    frames = np.arange(num_test_frames)
    action_clips = actions[split_id_test]
    factor_clips = factors[split_id_test]
    source_clips = sources[split_id_test]
    frame_clips = frames[split_id_test]
    gt_clips = gts[split_id_test]
    assert len(results_all) == len(action_clips)

    e1_all = np.zeros(num_test_frames)
    e2_all = np.zeros(num_test_frames)
    oc = np.zeros(num_test_frames)
    action_names = sorted(set(datareader.dt_dataset["test"]["action"]))
    results = {a: [] for a in action_names}
    results_procrustes = {a: [] for a in action_names}

    for idx in range(len(action_clips)):
        source = source_clips[idx][0][:-6]
        if source in BLOCK_LIST:
            continue
        frame_list = frame_clips[idx]
        factor = factor_clips[idx][:, None, None]
        gt = gt_clips[idx]
        pred = results_all[idx] * factor
        pred = pred - pred[:, 0:1, :]  # root-relative
        gt = gt - gt[:, 0:1, :]
        e1_all[frame_list] += mpjpe(pred, gt)
        e2_all[frame_list] += p_mpjpe(pred, gt)
        oc[frame_list] += 1

    covered = e1_all > 0
    for idx in np.nonzero(covered)[0]:
        results[actions[idx]].append(e1_all[idx] / oc[idx])
        results_procrustes[actions[idx]].append(e2_all[idx] / oc[idx])

    final_result = [np.mean(results[a]) for a in action_names]
    final_result_procrustes = [np.mean(results_procrustes[a])
                               for a in action_names]
    e1 = float(np.mean(final_result))
    e2 = float(np.mean(final_result_procrustes))
    per_action = {a: (float(p1), float(p2)) for a, p1, p2 in
                  zip(action_names, final_result, final_result_procrustes)}
    return e1, e2, per_action


def train_with_config(args, opts):
    """Epoch driver (parity: reference train.py:208-377).

    opts: namespace with checkpoint, pretrained, resume, evaluate,
    selection, seed. args: the YAML config.
    """
    import numpy as np

    from motionbert_tpu.core.cache import enable_compilation_cache
    from motionbert_tpu.core.checkpoint import (
        CheckpointManager, load_checkpoint, load_torch_checkpoint)
    from motionbert_tpu.core.logging import MetricsWriter
    from motionbert_tpu.core.metrics import AverageMeter
    from motionbert_tpu.data.datasets import (
        BatchLoader, InstaVDataset2D, MotionDataset3D, PoseTrackDataset2D)
    from motionbert_tpu.data.readers import DataReaderH36M
    from motionbert_tpu.models.factory import (
        load_backbone)
    from motionbert_tpu.parallel import make_mesh, shard_batch, shard_params
    from motionbert_tpu.train.state import TrainState, make_adamw

    enable_compilation_cache()
    os.makedirs(opts.checkpoint, exist_ok=True)
    writer = MetricsWriter(os.path.join(opts.checkpoint, "logs"))

    print("Loading dataset...")

    def build_dataset(split):
        # fast path: a packed native clip store next to the clip dir
        # (tools/pack_clips.py) serves batch gathers through C++ with zero
        # per-item Python; falls back to the pickle-per-clip dataset
        if len(args.subset_list) == 1:
            packed = os.path.join(args.data_root, args.subset_list[0],
                                  f"{split}.mbcs")
            if os.path.exists(packed):
                from motionbert_tpu.data.clipstore import ClipStoreDataset3D

                print(f"INFO: using native clip store {packed}")
                return ClipStoreDataset3D(
                    packed, synthetic=args.get("synthetic", False),
                    gt_2d=args.get("gt_2d", False),
                    scale_range_pretrain=args.get("scale_range_pretrain"),
                    data_split=split)
        return MotionDataset3D(args, args.subset_list, split)

    train_dataset = build_dataset("train")
    test_dataset = build_dataset("test")
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch_size = args.batch_size
    assert batch_size % n_dev == 0, (
        f"batch_size {batch_size} must divide over {n_dev} devices")
    train_loader = BatchLoader(train_dataset, batch_size, shuffle=True,
                               drop_last=True, seed=opts.seed)
    test_loader = BatchLoader(test_dataset, batch_size, shuffle=False)

    loaders_2d = []
    if args.get("train_2d", False):
        specs = [
            (PoseTrackDataset2D,
             {"data_root": args.get(
                 "posetrack_root",
                 "data/motion2d/posetrack18_annotations/train/")},
             True),   # has_gt (noise aug applies, train.py:328)
            (InstaVDataset2D,
             {"data_root": args.get("instav_root",
                                    "data/motion2d/InstaVariety")},
             False),  # has_gt=False (train.py:329)
        ]
        for ds_cls, kw, has_gt in specs:
            try:
                ds = ds_cls(**kw)
                loaders_2d.append(
                    (ds_cls.__name__,
                     BatchLoader(ds, batch_size, shuffle=True, drop_last=True,
                                 seed=opts.seed),
                     has_gt))
            except FileNotFoundError as e:
                print(f"WARNING: 2D dataset {ds_cls.__name__} unavailable "
                      f"({e}); skipping")

    datareader = DataReaderH36M(
        n_frames=args.clip_len, sample_stride=args.sample_stride,
        data_stride_train=args.data_stride, data_stride_test=args.clip_len,
        dt_root=args.get("dt_root", "data/motion3d"), dt_file=args.dt_file)

    model = load_backbone(args, remat=args.get("remat", False))
    rng = jax.random.PRNGKey(opts.seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(
        init_rng, jnp.zeros((1, args.clip_len, args.num_joints, 3)))["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print("INFO: Trainable parameter count:", n_params)

    ckpt_mgr = CheckpointManager(opts.checkpoint,
                                 args.get("checkpoint_frequency", 1))
    min_loss = 1e5
    lr = args.learning_rate
    st = 0
    resume_payload = None

    if args.get("finetune", False):
        chk = opts.evaluate or opts.resume or os.path.join(
            opts.pretrained, opts.selection)
        print("Loading checkpoint", chk)
        if chk.endswith(".bin") or chk.endswith(".pth"):
            params = load_torch_checkpoint(chk)["params"]  # strict
        else:
            payload = load_checkpoint(chk)
            params = payload["params"]
            if opts.resume:
                # the reference restores epoch/optimizer/lr/min_loss on
                # resume regardless of finetune (train.py:295-304)
                resume_payload = payload
    else:
        if ckpt_mgr.has_latest() and not opts.resume and not opts.evaluate:
            opts.resume = ckpt_mgr.latest_path
        chk = opts.evaluate or opts.resume
        if chk:
            print("Loading checkpoint", chk)
            if chk.endswith(".bin") or chk.endswith(".pth"):
                params = load_torch_checkpoint(chk)["params"]
            else:
                resume_payload = load_checkpoint(chk)
                params = resume_payload["params"]

    params = shard_params(params, mesh)

    if opts.evaluate:
        e1, e2, _, per_action = evaluate(args, model, params, test_loader,
                                         datareader, return_results=True,
                                         mesh=mesh)
        _print_eval_table(per_action, e1, e2)
        return {"e1": e1, "e2": e2}

    tx = make_adamw(lr, args.weight_decay)
    if args.get("partial_train", None):
        from motionbert_tpu.train.state import freeze_except

        tx = freeze_except(tx, params, args.partial_train)
    state = TrainState.create(model.apply, params, tx)
    if resume_payload is not None:
        st = resume_payload["epoch"]
        if resume_payload.get("opt_state") is not None:
            state = state.replace(opt_state=jax.tree_util.tree_map(
                jnp.asarray, resume_payload["opt_state"]))
        lr = resume_payload.get("lr", lr)
        state = state.set_lr(lr)
        if resume_payload.get("best_metric") is not None:
            min_loss = resume_payload["best_metric"]
        if (resume_payload.get("meta") or {}).get("rng") is not None:
            # restore the host PRNG stream so a resumed run draws the same
            # augmentation/dropout keys the uninterrupted run would have
            # (the reference does not persist RNG state across resume)
            rng = jnp.asarray(resume_payload["meta"]["rng"])

    use_mask = args.get("mask_ratio", 0) > 0 and args.get("mask_T_ratio", 0) > 0
    use_noise = bool(args.get("noise", False))
    noise_params = None
    if use_mask or use_noise:
        from motionbert_tpu.data.augment import NoiseParams

        noise_params = NoiseParams.load(
            args.get("noise_path", "params/synthetic_noise.npz"),
            args.get("d2c_params_path", "params/d2c_params.pkl"))

    # Random flip runs on-device inside the train step for every data path
    # (detector-input, synthetic/gt_2d, and 2D datasets). Flipping input and
    # target jointly is equivalent to the reference's host-side flips: for
    # synthetic clips the 2D input is derived from the 3D target
    # (dataset_motion_3d.py:49-53 after augment3D's flip), and the 2D
    # datasets return identical (input, target) pairs (dataset_motion_2d.py
    # :119-121 flips the one tensor).
    flip_aug = bool(args.get("flip", False))
    train_step = make_train_step(
        model, {k: args.get(k, 0.0) for k in
                ("lambda_scale", "lambda_3d_velocity", "lambda_lv",
                 "lambda_lg", "lambda_a", "lambda_av")},
        rootrel=args.get("rootrel", False),
        no_conf=args.get("no_conf", False),
        use_mask=use_mask, use_noise=use_noise, noise_params=noise_params,
        mask_ratio=args.get("mask_ratio", 0.0),
        mask_T_ratio=args.get("mask_T_ratio", 0.0), flip_aug=flip_aug)

    def run_epoch(state, rng, loader, losses, has_3d, has_gt):
        for batch_input, batch_gt in loader:
            rng, sub = jax.random.split(rng)
            bi, bg = shard_batch(
                (jnp.asarray(batch_input), jnp.asarray(batch_gt)), mesh)
            state, terms = train_step(state, bi, bg, sub,
                                      has_3d=has_3d, has_gt=has_gt)
            for k, val in terms.items():
                losses.setdefault(k, AverageMeter()).update(
                    float(val), len(batch_input))
        return state, rng

    for epoch in range(st, args.epochs):
        print(f"Training epoch {epoch}.")
        start = time.time()
        losses: dict = {}
        # true epoch index -> per-item augmentation RNG (resume-safe)
        train_loader.set_epoch(epoch)
        # curriculum: 2D datasets join after pretrain_3d_curriculum epochs
        if loaders_2d and epoch >= args.get("pretrain_3d_curriculum", 0):
            for name, loader2d, has_gt in loaders_2d:
                loader2d.set_epoch(epoch)
                state, rng = run_epoch(state, rng, loader2d, losses,
                                       has_3d=False, has_gt=has_gt)
        state, rng = run_epoch(state, rng, train_loader, losses,
                               has_3d=True, has_gt=True)
        elapsed = (time.time() - start) / 60.0

        if args.get("no_eval", False):
            print(f"[{epoch + 1}] time {elapsed:.2f} lr {lr:f} "
                  f"3d_train {losses['3d_pos'].avg:f}")
            e1 = min_loss  # no metric this epoch
            improved = False
        else:
            e1, e2, _, per_action = evaluate(
                args, model, state.params, test_loader, datareader,
                return_results=True, mesh=mesh)
            _print_eval_table(per_action, e1, e2)
            print(f"[{epoch + 1}] time {elapsed:.2f} lr {lr:f} "
                  f"3d_train {losses['3d_pos'].avg:f} e1 {e1:f} e2 {e2:f}")
            writer.add_scalar("Error P1", e1, epoch + 1)
            writer.add_scalar("Error P2", e2, epoch + 1)
            improved = e1 < min_loss
            min_loss = min(e1, min_loss)
        for k, meter in losses.items():
            writer.add_scalar(f"loss_{k}", meter.avg, epoch + 1)

        # exponential per-epoch LR decay (train.py:359-362)
        lr *= args.lr_decay
        state = state.scale_lr(args.lr_decay)

        ckpt_mgr.save_epoch(epoch, lr, state.params, state.opt_state,
                            best_metric=min_loss, improved=improved,
                            meta={"rng": np.asarray(rng)})
    writer.close()
    return {"e1": min_loss}


def _print_eval_table(per_action, e1, e2):
    names = list(per_action)
    w = max([len(n) for n in names] + [8])
    print(" ".join(["test_name".ljust(w)] + [n.ljust(w) for n in names]))
    print(" ".join(["P1".ljust(w)] +
                   [f"{per_action[n][0]:.2f}".ljust(w) for n in names]))
    print(" ".join(["P2".ljust(w)] +
                   [f"{per_action[n][1]:.2f}".ljust(w) for n in names]))
    print("Protocol #1 Error (MPJPE):", e1, "mm")
    print("Protocol #2 Error (P-MPJPE):", e2, "mm")
    print("----------")
