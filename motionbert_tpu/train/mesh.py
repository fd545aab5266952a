"""Mesh recovery training (parity: /root/reference/train_mesh.py).

Multi-dataset warmup schedule per epoch (h36m while epoch < warmup_h36m,
coco while < warmup_coco, pw3d always-if-enabled); flip-averaged validation
in SMPL theta space; MPVE / MPJPE / PA-MPJPE metrics; best checkpoint keyed
on MPJPE (pw3d when present, else h36m).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from motionbert_tpu.geometry.rotations import flip_thetas
from motionbert_tpu.geometry.skeleton import flip_data_jnp
from motionbert_tpu.losses.mesh import evaluate_mesh, mesh_total_loss
from motionbert_tpu.models.smpl import smpl_forward
from motionbert_tpu.train.state import TrainState


def make_mesh_train_step(model, lambdas: dict, loss_type: str = "L1"):
    # smpl: SMPLModel.array_pytree() — the body-model tensors ride as jit
    # arguments, not closed-over constants (~19 MB/executable at the real
    # 6890-vert topology through the remote compile service)
    @functools.partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, batch_input, batch_gt, rng, smpl):
        def loss_fn(params):
            out, updates = state.apply_fn(
                {"params": params, **(state.extra_vars or {})},
                batch_input, deterministic=False, rngs={"dropout": rng},
                smpl=smpl, mutable=["batch_stats"])
            total, terms = mesh_total_loss(out, batch_gt, lambdas, loss_type)
            return total, (out, terms, updates)

        (loss, (out, terms, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_extra_vars=updates)
        # train-time MPJPE/MPVE (reference compute_error, utils_mesh.py:357)
        pl = out["kp_3d"] - out["kp_3d"][:, :, 0:1]
        gl = batch_gt["kp_3d"] - batch_gt["kp_3d"][:, :, 0:1]
        terms["mpjpe"] = jnp.mean(jnp.linalg.norm(pl - gl, axis=-1))
        vl = out["verts"] - out["kp_3d"][:, :, 0:1]
        vgl = batch_gt["verts"] - batch_gt["kp_3d"][:, :, 0:1]
        terms["mpve"] = jnp.mean(jnp.linalg.norm(vl - vgl, axis=-1))
        return new_state, terms

    return train_step


def make_mesh_eval_step(model, smpl_model, flip_tta: bool):
    """Flip-averaged inference: the flipped prediction is mapped back by
    flipping the predicted thetas and re-running the SMPL layer
    (reference train_mesh.py:83-108). Memoized by (model, smpl_model)
    identity — the SMPL layer is baked into the flip-TTA trace, so a
    different body model must produce a fresh step — via the shared
    LRU-bounded cache (train/state.py::memo_step)."""
    from motionbert_tpu.train.state import IdKey, memo_step

    # IdKey: MeshRegressor embeds the SMPL arrays, so neither the module
    # nor the body model is hashable — key both by identity
    key = (IdKey(model), IdKey(smpl_model), "mesh_eval", flip_tta)
    return memo_step(key, lambda: _build_mesh_eval_step(
        model, smpl_model, flip_tta))


def _build_mesh_eval_step(model, smpl_model, flip_tta):
    # smpl rides as a jit argument (SMPLModel.array_pytree), not a
    # closed-over constant — see make_mesh_train_step
    @jax.jit
    def eval_step(params, extra_vars, batch_input, smpl):
        variables = {"params": params, **(extra_vars or {})}
        out = model.apply(variables, batch_input, deterministic=True,
                          smpl=smpl)
        if not flip_tta:
            return out
        m = smpl_model.with_arrays(smpl)
        N, T = batch_input.shape[:2]
        out_f = model.apply(variables, flip_data_jnp(batch_input),
                            deterministic=True, smpl=smpl)
        pose_f = flip_thetas(
            out_f["theta"][..., :72].reshape(N, T, 24, 3)).reshape(N * T, 72)
        shape_f = out_f["theta"][..., 72:].reshape(N * T, -1)
        smpl_out = smpl_forward(m, shape_f, pose_f, pose2rot=True)
        verts_f = smpl_out["vertices"] * 1000.0
        kp_f = jnp.einsum("jv,bvc->bjc",
                          jnp.asarray(m.J_regressor_h36m), verts_f)
        back = {
            "theta": jnp.concatenate(
                [pose_f.reshape(N, T, -1), shape_f.reshape(N, T, -1)], -1),
            "verts": verts_f.reshape(N, T, -1, 3),
            "kp_3d": kp_f.reshape(N, T, -1, 3),
        }
        return {k: (out[k] + back[k]) * 0.5 for k in out}

    return eval_step


def validate(test_loader, model, params, extra_vars, smpl_model, args,
             dataset_name="h36m", mesh=None):
    """Returns (loss, mpjpe, pa_mpjpe, mpve, per-term dict). With a device
    mesh, eval batches shard over the data axis like training (parity with
    the reference's DataParallel-wrapped validation, train_mesh.py:60)."""
    import numpy as np

    from motionbert_tpu.core.metrics import AverageMeter
    from motionbert_tpu.parallel import padded_eval_batches

    eval_step = make_mesh_eval_step(model, smpl_model,
                                    flip_tta=args.get("flip", False))
    # jitted (and memoized: one compile per distinct lambda/loss-type
    # combination across epochs) — the eager per-op path paid ms-scale
    # dispatch RPC per op per batch on the remote-compile TPU backend.
    # Keyed by the VALUES (not id(args)): the weights are baked into the
    # trace, so mutating args must produce a fresh compile, never a stale
    # cached closure.
    from motionbert_tpu.losses.mesh import LAMBDA_KEYS

    from motionbert_tpu.train.state import memo_step

    lambdas = {k: float(args[k]) for k in LAMBDA_KEYS}
    loss_type = args.get("loss_type", "L1")

    def build():
        @jax.jit
        def val_loss(out, gt):
            return mesh_total_loss(out, gt, lambdas, loss_type)

        return val_loss

    val_loss = memo_step(
        ("val_loss", tuple(sorted(lambdas.items())), loss_type), build)
    losses = AverageMeter()
    terms_meters: dict = {}
    results = {"kp_3d": [], "verts": [], "kp_3d_gt": [], "verts_gt": []}
    smpl_args = smpl_model.array_pytree()  # device-resident once per call
    for batch_input, batch_gt, n in padded_eval_batches(test_loader, mesh):
        out = eval_step(params, extra_vars, batch_input, smpl_args)
        out = {k: np.asarray(v)[:n] for k, v in out.items()}
        gt = {k: np.asarray(v) for k, v in batch_gt.items()}
        total, terms = val_loss(
            jax.tree_util.tree_map(jnp.asarray, out),
            jax.tree_util.tree_map(jnp.asarray, gt))
        losses.update(float(total), n)
        for k, v in terms.items():
            terms_meters.setdefault(k, AverageMeter()).update(float(v), n)
        results["kp_3d"].append(out["kp_3d"])
        results["verts"].append(out["verts"])
        results["kp_3d_gt"].append(gt["kp_3d"])
        results["verts_gt"].append(gt["verts"])
    results = {k: np.concatenate(v) for k, v in results.items()}
    err = evaluate_mesh(results)
    print(f"=======================> {dataset_name} validation done:",
          " ".join(f"{k}: {v:.2f}mm" for k, v in err.items()))
    return (losses.avg, err["mpjpe"], err["pa_mpjpe"], err["mpve"],
            terms_meters)


def build_mesh_model(args, smpl_model):
    from motionbert_tpu.models.factory import (
        load_backbone)
    from motionbert_tpu.models.mesh_head import MeshRegressor

    backbone = load_backbone(args, remat=args.get("remat", False))
    return MeshRegressor(backbone=backbone, smpl_model=smpl_model,
                         dim_rep=args.dim_rep,
                         num_joints=args.num_joints,
                         hidden_dim=args.get("hidden_dim", 1024),
                         dropout_ratio=args.get("dropout", 0.5))


def train_with_config(args, opts):
    import numpy as np

    from motionbert_tpu.core.cache import enable_compilation_cache
    from motionbert_tpu.core.checkpoint import (
        CheckpointManager, load_any_checkpoint,
        load_pretrained_params)
    from motionbert_tpu.core.logging import MetricsWriter
    from motionbert_tpu.core.metrics import AverageMeter
    from motionbert_tpu.data.dataset_mesh import MotionSMPL
    from motionbert_tpu.data.datasets import BatchLoader
    from motionbert_tpu.models.smpl import SMPLModel
    from motionbert_tpu.parallel import (
        make_mesh, maybe_shard_batch, shard_params)
    from motionbert_tpu.train.action import make_two_group_adamw

    enable_compilation_cache()
    os.makedirs(opts.checkpoint, exist_ok=True)
    writer = MetricsWriter(os.path.join(opts.checkpoint, "logs"))

    smpl_path = args.get("smpl_model_path",
                         os.path.join(args.data_root, "smpl_model.npz"))
    smpl_model = SMPLModel.from_npz(smpl_path)
    model = build_mesh_model(args, smpl_model)

    rng = jax.random.PRNGKey(getattr(opts, "seed", 0))
    rng, init_rng = jax.random.split(rng)
    variables = model.init(
        init_rng, jnp.zeros((1, args.clip_len, args.num_joints, 3)))
    params = variables["params"]
    extra_vars = {k: v for k, v in variables.items() if k != "params"}

    if args.get("finetune", False) and not (opts.resume or opts.evaluate):
        chk = os.path.join(opts.pretrained, opts.selection)
        print("Loading backbone", chk)
        ckpt_params = load_any_checkpoint(chk)["params"]
        new_backbone, matched, _ = load_pretrained_params(
            params["backbone"], ckpt_params)
        print("load_weight", len(matched))
        params = dict(params, backbone=new_backbone)

    print("Loading dataset...")
    loaders = {}
    if "dt_file_h36m" in args:
        loaders["h36m"] = (
            BatchLoader(MotionSMPL(args, "train", "h36m", smpl_model),
                        args.batch_size, shuffle=True, drop_last=True),
            BatchLoader(MotionSMPL(args, "test", "h36m", smpl_model),
                        args.batch_size))
    if "dt_file_coco" in args:
        loaders["coco"] = (
            BatchLoader(MotionSMPL(args, "train", "coco", smpl_model),
                        args.get("batch_size_img", args.batch_size),
                        shuffle=True, drop_last=True),
            BatchLoader(MotionSMPL(args, "test", "coco", smpl_model),
                        args.get("batch_size_img", args.batch_size)))
    if "dt_file_pw3d" in args:
        train_pw = None
        if args.get("train_pw3d", False):
            train_pw = BatchLoader(
                MotionSMPL(args, "train", "pw3d", smpl_model),
                args.batch_size, shuffle=True, drop_last=True)
        loaders["pw3d"] = (
            train_pw,
            BatchLoader(MotionSMPL(args, "test", "pw3d", smpl_model),
                        args.batch_size))

    ckpt_mgr = CheckpointManager(opts.checkpoint,
                                 args.get("checkpoint_frequency", 1))
    best_jpe = 9999.0
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
        out = {}
        for name in ("h36m", "pw3d"):
            if name in loaders:
                _, jpe, pa, ve, _ = validate(loaders[name][1], model, params,
                                             extra_vars, smpl_model, args,
                                             name, mesh=mesh)
                out[name] = {"mpjpe": jpe, "pa_mpjpe": pa, "mpve": ve}
        return out

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
        best_jpe = resume_payload.get("best_metric") or 9999.0
        if (resume_payload.get("meta") or {}).get("rng") is not None:
            rng = jnp.asarray(resume_payload["meta"]["rng"])

    # strict access: a missing lambda key should fail loudly like
    # the reference's args.lambda_* attribute reads
    from motionbert_tpu.losses.mesh import LAMBDA_KEYS

    lambdas = {k: args[k] for k in LAMBDA_KEYS}
    train_step = make_mesh_train_step(model, lambdas,
                                      args.get("loss_type", "L1"))
    smpl_args = smpl_model.array_pytree()  # device-resident, jit argument

    print_freq = int(getattr(opts, "print_freq", 100) or 100)

    def run_train(state, rng, loader, losses):
        n_batches = len(loader)
        for idx, (batch_input, batch_gt) in enumerate(loader):
            rng, sub = jax.random.split(rng)
            bi, bg = maybe_shard_batch(
                (jnp.asarray(batch_input),
                 jax.tree_util.tree_map(jnp.asarray, batch_gt)), mesh)
            state, terms = train_step(state, bi, bg, sub, smpl_args)
            for k, v in terms.items():
                losses.setdefault(k, AverageMeter()).update(
                    float(v), batch_input.shape[0])
            if (idx + 1) % print_freq == 0:  # reference train_mesh.py:206
                tm = losses.get("total")
                print(f"[{idx + 1}/{n_batches}]\t"
                      f"loss {tm.val:.4f} ({tm.avg:.4f})", flush=True)
        return state, rng

    for epoch in range(st, args.epochs):
        print(f"Training epoch {epoch}.")
        for train_ld, _ in loaders.values():
            if train_ld is not None:  # pw3d may be eval-only (train_pw3d: false)
                train_ld.set_epoch(epoch)  # resume-safe augmentation epoch
        losses: dict = {}
        test_mpjpe = None
        if "h36m" in loaders and epoch < args.get("warmup_h36m", args.epochs):
            state, rng = run_train(state, rng, loaders["h36m"][0], losses)
            _, test_mpjpe, pa, ve, _ = validate(
                loaders["h36m"][1], model, state.params, state.extra_vars,
                smpl_model, args, "h36m", mesh=mesh)
            writer.add_scalar("test_mpjpe", test_mpjpe, epoch + 1)
            writer.add_scalar("test_pa_mpjpe", pa, epoch + 1)
            writer.add_scalar("test_mpve", ve, epoch + 1)
        if "coco" in loaders and epoch < args.get("warmup_coco", args.epochs):
            state, rng = run_train(state, rng, loaders["coco"][0], losses)
        if "pw3d" in loaders:
            if loaders["pw3d"][0] is not None:
                state, rng = run_train(state, rng, loaders["pw3d"][0], losses)
            _, test_mpjpe, pa, ve, _ = validate(
                loaders["pw3d"][1], model, state.params, state.extra_vars,
                smpl_model, args, "pw3d", mesh=mesh)
            writer.add_scalar("test_mpjpe_pw3d", test_mpjpe, epoch + 1)
            writer.add_scalar("test_pa_mpjpe_pw3d", pa, epoch + 1)
            writer.add_scalar("test_mpve_pw3d", ve, epoch + 1)
        for k, m in losses.items():
            writer.add_scalar(f"train_loss/{k}", m.avg, epoch + 1)
        state = state.scale_lr(args.lr_decay)
        improved = test_mpjpe is not None and test_mpjpe < best_jpe
        if improved:
            best_jpe = test_mpjpe
        print(f"[{epoch + 1}] train_total "
              f"{losses.get('total', AverageMeter()).avg:.4f} "
              f"test_mpjpe {test_mpjpe} best {best_jpe}")
        ckpt_mgr.save_epoch(epoch, float(state.lr or 0), state.params,
                            state.opt_state, extra_vars=state.extra_vars,
                            best_metric=best_jpe, improved=improved,
                            meta={"rng": np.asarray(rng)})
    writer.close()
    return {"best_jpe": best_jpe}
