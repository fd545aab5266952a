"""Generate golden test vectors from the reference implementation.

Run where /root/reference (the PyTorch MotionBERT repo) is available:
    python tools/make_goldens.py

Outputs npz files under tests/goldens/ which are committed; the test suite
never imports the reference directly. Goldens capture *behavior* (inputs ->
outputs) of the reference for parity testing of the from-scratch JAX
implementation.
"""

import os
import sys

import numpy as np

REF = os.environ.get("MOTIONBERT_REF", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

sys.path.insert(0, REF)

# Shim optional reference deps that aren't installed (module-level imports
# in the reference: easydict in tools.py, ipdb in dataset_wild.py).
import types  # noqa: E402

if "easydict" not in sys.modules:
    _ed = types.ModuleType("easydict")

    class _EasyDict(dict):
        def __getattr__(self, k):
            return self[k]

    _ed.EasyDict = _EasyDict
    sys.modules["easydict"] = _ed
for _name in ("ipdb",):
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)

import torch  # noqa: E402

torch.manual_seed(0)
np.random.seed(0)


def golden_dstformer():
    from functools import partial
    import torch.nn as nn
    from lib.model.DSTformer import DSTformer

    cfgs = {
        "small": dict(dim_in=3, dim_out=3, dim_feat=64, dim_rep=64, depth=2,
                      num_heads=4, mlp_ratio=2, num_joints=17, maxlen=27),
        # Full-architecture shape but scaled-down width so the npz stays small
        "mid": dict(dim_in=3, dim_out=3, dim_feat=128, dim_rep=128, depth=5,
                    num_heads=8, mlp_ratio=2, num_joints=17, maxlen=81),
        # Flagship width (dim_feat=512/8 heads, the published architecture,
        # README.md:78) at depth=1 so golden parity crosses the exact dims
        # the fused kernels run in production. Weights are stored fp16 to
        # keep the npz small; the reference outputs are generated FROM the
        # fp16-rounded weights, so parity remains exact (fp16 -> fp32 is
        # lossless on load).
        "flagship": dict(dim_in=3, dim_out=3, dim_feat=512, dim_rep=512,
                         depth=1, num_heads=8, mlp_ratio=2, num_joints=17,
                         maxlen=27),
        # MotionBERT-Lite width (dim_feat=256, mlp_ratio=4 — README.md:79,
        # configs/pretrain/MB_lite.yaml) at depth=1, same fp16 scheme:
        # C=256 crosses the fused kernels at the zoo's second geometry
        "lite": dict(dim_in=3, dim_out=3, dim_feat=256, dim_rep=512,
                     depth=1, num_heads=8, mlp_ratio=4, num_joints=17,
                     maxlen=27),
    }
    for name, kw in cfgs.items():
        torch.manual_seed(42)
        model = DSTformer(norm_layer=partial(nn.LayerNorm, eps=1e-6), **kw)
        model.eval()
        half = name in ("flagship", "lite")
        if half:
            sd = {k: v.half().float() for k, v in model.state_dict().items()}
            model.load_state_dict(sd)
        F = kw["maxlen"] // 3  # exercise F < maxlen (temp_embed truncation)
        x = torch.from_numpy(
            np.random.RandomState(7).uniform(-1, 1, (2, F, 17, 3)).astype(np.float32)
        )
        with torch.no_grad():
            out = model(x)
            rep = model(x, return_rep=True)
        data = {"x": x.numpy(), "out": out.numpy(), "rep": rep.numpy()}
        for k, v in model.state_dict().items():
            data["sd:" + k] = v.half().numpy() if half else v.numpy()
        np.savez_compressed(os.path.join(OUT, f"dstformer_{name}.npz"), **data)
        print(f"dstformer_{name}: out {out.shape}, params "
              f"{sum(v.numel() for v in model.state_dict().values())}")


def golden_geometry():
    from lib.utils.utils_data import crop_scale, crop_scale_3d, flip_data, \
        resample, split_clips
    from lib.data.dataset_action import coco2h36m, make_cam, human_tracking, \
        random_move
    from lib.data.dataset_wild import halpe2h36m
    from lib.data.dataset_motion_2d import posetrack2h36m

    rs = np.random.RandomState(3)
    data = {}

    m2d = rs.uniform(0, 1000, (8, 17, 3)).astype(np.float32)
    m2d[..., 2] = rs.uniform(0.1, 1, (8, 17))
    m2d[0, 3, 2] = 0  # some invalid joints
    np.random.seed(11)
    data["crop_scale_in"] = m2d
    data["crop_scale_out"] = crop_scale(m2d, [1, 1])
    np.random.seed(12)
    data["crop_scale_r_out"] = crop_scale(m2d, [0.5, 2.0])
    data["crop_scale_r_seed"] = np.array(12)

    m3d = rs.uniform(-1, 1, (9, 17, 3)).astype(np.float32)
    np.random.seed(13)
    data["crop_scale_3d_in"] = m3d
    data["crop_scale_3d_out"] = crop_scale_3d(m3d, [1, 1])

    data["flip_in"] = rs.uniform(-1, 1, (4, 9, 17, 3)).astype(np.float32)
    data["flip_out"] = flip_data(data["flip_in"])

    data["resample_down"] = np.asarray(resample(100, 32, randomness=False))
    data["resample_up"] = np.asarray(resample(10, 32, randomness=False))
    np.random.seed(14)
    data["resample_replay_up"] = np.asarray(resample(10, 32, replay=True))

    vid_list = np.concatenate([
        np.full(25, 0), np.full(11, 1), np.full(40, 2), np.full(8, 3),
    ])
    np.random.seed(15)
    clips = split_clips(vid_list, n_frames=16, data_stride=8)
    data["split_vid_list"] = vid_list
    data["split_n"] = np.array(16)
    data["split_stride"] = np.array(8)
    data["split_clips_out"] = np.stack([np.asarray(list(c)) for c in clips])
    data["split_seed"] = np.array(15)

    x_coco = rs.uniform(-1, 1, (2, 5, 17, 3))
    data["coco_in"] = x_coco
    data["coco_out"] = coco2h36m(x_coco)
    x_halpe = rs.uniform(-1, 1, (5, 26, 3))
    data["halpe_in"] = x_halpe
    data["halpe_out"] = halpe2h36m(x_halpe)
    x_pt = rs.uniform(-1, 1, (5, 17, 3))
    data["posetrack_in"] = x_pt
    data["posetrack_out"] = posetrack2h36m(x_pt)

    data["make_cam_in"] = rs.uniform(0, 480, (2, 5, 17, 2))
    data["make_cam_shape"] = np.array([480, 640])
    data["make_cam_out"] = make_cam(data["make_cam_in"], (480, 640))

    x_track = rs.uniform(-1, 1, (2, 12, 17, 2))
    data["track_in"] = x_track
    data["track_out"] = human_tracking(x_track)

    np.savez_compressed(os.path.join(OUT, "geometry.npz"), **data)
    print("geometry goldens written")


def golden_rotations():
    from lib.utils.utils_mesh import batch_rodrigues, quat2mat, \
        rot6d_to_rotmat, rotation_matrix_to_angle_axis, flip_thetas
    from lib.model.loss import p_mpjpe, mpjpe

    rs = np.random.RandomState(5)
    data = {}

    aa = rs.uniform(-1.5, 1.5, (32, 3)).astype(np.float32)
    data["aa_in"] = aa
    data["rodrigues_out"] = (
        batch_rodrigues(torch.from_numpy(aa)).reshape(-1, 3, 3).numpy()
    )

    quat = rs.normal(size=(16, 4)).astype(np.float32)
    data["quat_in"] = quat
    data["quat2mat_out"] = quat2mat(torch.from_numpy(quat)).numpy()

    r6 = rs.normal(size=(24, 6)).astype(np.float32)
    data["rot6d_in"] = r6
    data["rot6d_out"] = rot6d_to_rotmat(torch.from_numpy(r6)).numpy()

    rotmats = data["rodrigues_out"]
    data["rotmat2aa_out"] = rotation_matrix_to_angle_axis(
        torch.from_numpy(rotmats)).numpy()

    thetas = rs.normal(size=(4, 24, 3)).astype(np.float32)
    data["thetas_in"] = thetas
    data["flip_thetas_out"] = flip_thetas(thetas)

    pred = rs.normal(size=(6, 17, 3)).astype(np.float64)
    gt = pred + rs.normal(scale=0.05, size=(6, 17, 3))
    data["pmpjpe_pred"] = pred
    data["pmpjpe_gt"] = gt
    data["pmpjpe_out"] = p_mpjpe(pred, gt)
    data["mpjpe_out"] = mpjpe(pred, gt)

    np.savez_compressed(os.path.join(OUT, "rotations.npz"), **data)
    print("rotation goldens written")


def golden_losses():
    from lib.model.loss import loss_mpjpe, n_mpjpe, loss_velocity, \
        loss_limb_var, loss_limb_gt, loss_angle, loss_angle_velocity, \
        loss_2d_weighted, weighted_mpjpe

    rs = np.random.RandomState(9)
    pred = rs.normal(size=(4, 9, 17, 3)).astype(np.float32)
    gt = (pred + rs.normal(scale=0.1, size=(4, 9, 17, 3))).astype(np.float32)
    conf = rs.uniform(0, 1, (4, 9, 17, 1)).astype(np.float32)
    w = rs.uniform(0.5, 1.5, (4, 1, 1)).astype(np.float32)
    tp, tg, tc, tw = map(torch.from_numpy, (pred, gt, conf, w))
    data = {
        "pred": pred, "gt": gt, "conf": conf, "w": w,
        "loss_mpjpe": loss_mpjpe(tp, tg).numpy(),
        "weighted_mpjpe": weighted_mpjpe(tp, tg, tw).numpy(),
        "n_mpjpe": n_mpjpe(tp, tg).numpy(),
        "loss_velocity": loss_velocity(tp, tg).numpy(),
        "loss_limb_var": loss_limb_var(tp).numpy(),
        "loss_limb_gt": loss_limb_gt(tp, tg).numpy(),
        "loss_angle": loss_angle(tp, tg).numpy(),
        "loss_angle_velocity": loss_angle_velocity(tp, tg).numpy(),
        "loss_2d_weighted": loss_2d_weighted(tp, tg, tc).numpy(),
    }
    np.savez_compressed(os.path.join(OUT, "losses.npz"), **data)
    print("loss goldens written")


def golden_datareader():
    """Run the reference DataReaderH36M on our synthetic pickle and record
    sliced/denormalized outputs (tests our vectorized reader end to end)."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    from tools.make_synthetic_data import make_h36m_pickle

    dt_root = os.path.join(OUT, "_tmp_dr")
    os.makedirs(dt_root, exist_ok=True)
    make_h36m_pickle(os.path.join(dt_root, "h36m_synth.pkl"))

    from lib.data.datareader_h36m import DataReaderH36M

    np.random.seed(21)
    reader = DataReaderH36M(
        n_frames=16, sample_stride=1, data_stride_train=8,
        data_stride_test=16, dt_root=dt_root, dt_file="h36m_synth.pkl")
    train_data, test_data, train_labels, test_labels = reader.get_sliced_data()
    rs = np.random.RandomState(33)
    fake_results = rs.normal(size=test_data.shape).astype(np.float32)
    denorm = reader.denormalize(fake_results.copy())
    np.savez_compressed(
        os.path.join(OUT, "datareader.npz"),
        train_data=train_data, test_data=test_data,
        train_labels=train_labels, test_labels=test_labels,
        fake_results=fake_results, denorm=denorm,
        test_hw=reader.get_hw(),
        split_test=np.stack([np.asarray(list(c))
                             for c in reader.get_split_id()[1]]),
    )
    import shutil
    shutil.rmtree(dt_root)
    print("datareader goldens written")


def golden_action_dataset():
    """Reference NTURGBD pipeline on our synthetic pyskl pickle."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    from tools.make_synthetic_data import make_action_pickle

    tmp = os.path.join(OUT, "_tmp_act")
    os.makedirs(tmp, exist_ok=True)
    pkl = os.path.join(tmp, "ntu_synth.pkl")
    make_action_pickle(pkl)

    from lib.data.dataset_action import NTURGBD

    # val split: deterministic resample (randomness=False), no random_move;
    # scale_range [2,2] makes crop_scale's ratio draw constant.
    ds = NTURGBD(data_path=pkl, data_split="xsub_val", n_frames=24,
                 random_move=False, scale_range=[2, 2])
    motions = np.stack([ds[i][0] for i in range(len(ds))])
    labels = np.array([ds[i][1] for i in range(len(ds))])
    np.savez_compressed(os.path.join(OUT, "action_dataset.npz"),
                        motions=motions, labels=labels)
    import shutil
    shutil.rmtree(tmp)
    print("action dataset goldens written")


def golden_datasets_2d():
    """Reference PoseTrack/InstaVariety dataset classes parsed over OUR
    synthetic files (tools/make_synthetic_data) — pins the parse+filter
    pipeline (track grouping, 30-frame/valid-joint/root-visible filters,
    crop_scale RNG order, posetrack->h36m remap, split_clips) so a shared
    misreading of the real formats cannot pass silently (VERDICT r2 #7).
    The reference classes hardcode relative data roots, so we chdir into a
    synthetic tree shaped like the real one.
    Reference: lib/data/dataset_motion_2d.py:77-147."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    import shutil
    import tempfile

    from tools.make_synthetic_data import make_instav_npy, make_posetrack_json

    root = tempfile.mkdtemp(prefix="golden2d_")
    make_posetrack_json(
        os.path.join(root, "data", "motion2d", "posetrack18_annotations",
                     "train"), n_files=2, n_tracks=3, n_frames=35)
    make_instav_npy(os.path.join(root, "data", "motion2d", "InstaVariety"))

    from lib.data.dataset_motion_2d import (
        InstaVDataset2D, PoseTrackDataset2D)

    cwd = os.getcwd()
    try:
        os.chdir(root)
        np.random.seed(0)  # crop_scale draws from the global RNG
        pt = PoseTrackDataset2D()
        np.random.seed(0)
        iv = InstaVDataset2D(n_frames=27, data_stride=9)
    finally:
        os.chdir(cwd)
    np.savez_compressed(
        os.path.join(OUT, "datasets_2d.npz"),
        posetrack_motions=np.asarray(pt.motions_2d, np.float32),
        instav_motions=np.asarray(iv.motions_2d, np.float32))
    shutil.rmtree(root)
    print("2d dataset goldens written "
          f"(posetrack {pt.motions_2d.shape}, instav {iv.motions_2d.shape})")


def golden_legacy_attention():
    """Reference Attention legacy modes + stage_para Block on fixed inputs."""
    from functools import partial
    import torch.nn as nn
    from lib.model.DSTformer import Attention, Block

    rs = np.random.RandomState(23)
    B, F, J, C, H = 2, 6, 17, 32, 4
    x = rs.normal(size=(B * F, J, C)).astype(np.float32)
    xt = torch.from_numpy(x)
    data = {"x": x, "F": np.array(F)}
    for mode in ("series", "parallel", "coupling", "vanilla", "temporal",
                 "spatial"):
        torch.manual_seed(5)
        attn = Attention(C, num_heads=H, qkv_bias=True, st_mode=mode)
        attn.eval()
        with torch.no_grad():
            out = attn(xt, seqlen=F)
        data[f"{mode}:out"] = out.numpy()
        for kname, v in attn.state_dict().items():
            data[f"{mode}:sd:{kname}"] = v.numpy()

    torch.manual_seed(6)
    blk = Block(C, num_heads=H, mlp_ratio=2, qkv_bias=True,
                st_mode="stage_para", att_fuse=True,
                norm_layer=partial(nn.LayerNorm, eps=1e-6))
    blk.eval()
    with torch.no_grad():
        out = blk(xt, seqlen=F)
    data["stage_para:out"] = out.numpy()
    for kname, v in blk.state_dict().items():
        data[f"stage_para:sd:{kname}"] = v.numpy()
    np.savez_compressed(os.path.join(OUT, "legacy_attention.npz"), **data)
    print("legacy attention goldens written")


def golden_supcon():
    from lib.model.loss_supcon import SupConLoss

    rs = np.random.RandomState(17)
    feats = rs.normal(size=(8, 2, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = rs.randint(0, 3, 8)
    # instantiate exactly as the reference trainer does
    # (train_action_1shot.py:95): base_temperature keeps its 0.07 default
    loss = SupConLoss(temperature=0.1)(
        torch.from_numpy(feats), torch.from_numpy(labels))

    # The one-shot trainer's exact semantics (train_action_1shot.py:188-196):
    # an m-per-class batch of single-view embeddings reshaped
    # (batch, -1, hidden) — every row its own anchor, positives purely from
    # the label matrix.
    rs2 = np.random.RandomState(23)
    batch, hidden, m = 16, 32, 4
    labels_m = np.repeat(np.arange(batch // m), m)
    rs2.shuffle(labels_m)
    feats_m = rs2.normal(size=(batch, hidden)).astype(np.float32)
    feats_m /= np.linalg.norm(feats_m, axis=-1, keepdims=True)
    loss_m = SupConLoss(temperature=0.1)(
        torch.from_numpy(feats_m.reshape(batch, -1, hidden)),
        torch.from_numpy(labels_m))
    np.savez_compressed(os.path.join(OUT, "supcon.npz"), feats=feats,
                        labels=labels, loss=loss.numpy(),
                        feats_mpc=feats_m, labels_mpc=labels_m,
                        loss_mpc=loss_m.numpy())
    print("supcon goldens written")


def golden_mesh_eval():
    """Mesh eval metrics (reference utils_mesh.py:357-438): evaluate_mesh
    MPVE / MPJPE-14/17 / PA-MPJPE-14/17 — including the h36m_17_to_14
    subset at utils_mesh.py:410 and the rigid_align Procrustes path — plus
    compute_error / compute_error_frames. Inputs are stored f16 to keep
    the committed npz small; the reference outputs are generated FROM the
    f16-rounded values (the dstformer_flagship pattern), so the parity
    test reruns on bit-identical inputs."""
    from lib.utils.utils_mesh import (compute_error, compute_error_frames,
                                      evaluate_mesh)

    rs = np.random.RandomState(7)
    N, V = 5, 6890
    gt_verts = (rs.randn(N, V, 3) * 100).astype(np.float16)
    gt_j = (rs.randn(N, 17, 3) * 100).astype(np.float16)
    # pred = per-sample similarity transform of GT + noise: PA alignment
    # must recover the transform (exercising scale/rotation/translation in
    # rigid_transform_3D) while the residual noise keeps every metric
    # non-degenerate. mm-scale magnitudes match the real eval.
    preds_v, preds_j = [], []
    for n in range(N):
        ang = rs.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        sc = rs.uniform(0.8, 1.2)
        t = rs.randn(3) * 50
        preds_v.append(sc * gt_verts[n].astype(np.float64) @ R.T + t
                       + rs.randn(V, 3) * 5)
        preds_j.append(sc * gt_j[n].astype(np.float64) @ R.T + t
                       + rs.randn(17, 3) * 5)
    pred_verts = np.asarray(preds_v).astype(np.float16)
    pred_j = np.asarray(preds_j).astype(np.float16)

    results = {"verts": pred_verts.astype(np.float32),
               "verts_gt": gt_verts.astype(np.float32),
               "kp_3d": pred_j.astype(np.float32),
               "kp_3d_gt": gt_j.astype(np.float32)}
    err = evaluate_mesh(results)

    out = [{"verts": torch.from_numpy(results["verts"]),
            "kp_3d": torch.from_numpy(results["kp_3d"])}]
    tgt = {"verts": torch.from_numpy(results["verts_gt"]),
           "kp_3d": torch.from_numpy(results["kp_3d_gt"])}
    ce_mpjpe, ce_mpve = compute_error(out, tgt)
    cef_mpjpes, cef_mpves = compute_error_frames(out, tgt)
    np.savez_compressed(
        os.path.join(OUT, "mesh_eval.npz"),
        verts=pred_verts, verts_gt=gt_verts, kp_3d=pred_j, kp_3d_gt=gt_j,
        **{f"em_{k}": np.float64(v) for k, v in err.items()},
        ce_mpjpe=np.float64(ce_mpjpe), ce_mpve=np.float64(ce_mpve),
        cef_mpjpes=cef_mpjpes.numpy(), cef_mpves=cef_mpves.numpy())
    print("mesh_eval goldens written:", {k: round(float(v), 3)
                                         for k, v in err.items()})


def golden_converters():
    """Run the REFERENCE offline converters (tools/convert_insta.py,
    tools/compress_amass.py, tools/convert_amass.py — all top-level
    scripts with hard-coded relative paths) on synthetic input trees via
    runpy in a temp cwd, and pin their outputs. The repo ports rerun on
    the same stored inputs in tests/test_converters.py (the r3
    datasets_2d pattern: shared-misreading risk is caught by comparing
    behaviors, not code)."""
    import runpy
    import pickle
    import shutil
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.convert_insta import write_track_tree

    rs = np.random.RandomState(21)
    data = {}
    here = os.getcwd()

    # --- convert_insta: 3 real clips + a degenerate (<4 valid coords ->
    # crop_scale zeros path) + an empty clip dir (skip path). Zero-logits
    # joints (Belly/Head always; one extra) exercise the final zeroing.
    tree = []
    for k, (rel, L) in enumerate([("vid00/clip_a", 25), ("vid00/clip_b", 17),
                                  ("vid01/clip_a", 40)]):
        arr = rs.uniform(0, 640, (L, 17, 3))
        arr[..., 2] = rs.uniform(0.1, 1.0, (L, 17))
        arr[0, 5, 2] = 0.0  # a zero-confidence joint beyond Belly/Head
        tree.append((rel, arr))
    degen = np.zeros((3, 17, 3))
    degen[..., :2] = rs.uniform(0, 640, (3, 17, 2))  # logits all zero
    tree.append(("vid01/clip_degen", degen))
    tree.append(("vid01/clip_empty", None))
    for i, (rel, arr) in enumerate(tree):
        data[f"insta_rel_{i}"] = np.str_(rel)
        if arr is not None:
            data[f"insta_raw_{i}"] = arr
    data["insta_n_clips"] = np.array(len(tree))

    tmp = tempfile.mkdtemp()
    try:
        root = os.path.join(tmp, "data", "Motion2d", "InstaVariety",
                            "InstaVariety_tracks")
        write_track_tree(os.path.join(root, "golden_action"), tree)
        os.chdir(tmp)
        argv_was = sys.argv
        sys.argv = ["convert_insta.py", "--name_action", "golden_action"]
        try:
            runpy.run_path(os.path.join(REF, "tools", "convert_insta.py"),
                           run_name="__main__")
        finally:
            sys.argv = argv_was
            os.chdir(here)
        with open(os.path.join(root, "golden_action",
                               "golden_action.pkl"), "rb") as f:
            motions = pickle.load(f)
        data["insta_n_out"] = np.array(len(motions))
        for i, m in enumerate(motions):
            data[f"insta_out_{i}"] = m
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- compress_amass: synthetic raw npz tree (one fps per stride case
    # + a corrupt file both sides must skip). Content parity only: the
    # reference's fname_new mangling is path-prefix-dependent cosmetics.
    seqs = [("a/seq1.npz", 120.0, 12), ("a/seq2.npz", 60.0, 9),
            ("b/seq3.npz", 240.0, 17)]
    raw = []
    for rel, fps, n in seqs:
        raw.append(dict(
            mocap_framerate=np.float64(fps),
            trans=rs.randn(n, 3).astype(np.float32),
            poses=rs.randn(n, 156).astype(np.float32),
            dmpls=rs.randn(n, 8).astype(np.float32),
            betas=rs.randn(16).astype(np.float32),
            gender=np.str_("male")))
    data["compress_n_seqs"] = np.array(len(seqs))
    for i, ((rel, fps, n), x) in enumerate(zip(seqs, raw)):
        data[f"compress_rel_{i}"] = np.str_(rel)
        for k in ("mocap_framerate", "trans", "poses", "dmpls", "betas"):
            data[f"compress_in_{i}_{k}"] = x[k]

    tmp = tempfile.mkdtemp()
    try:
        for (rel, fps, n), x in zip(seqs, raw):
            p = os.path.join(tmp, "data", "AMASS", "amass_202203", rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            np.savez(p, **x)
        with open(os.path.join(tmp, "data", "AMASS", "amass_202203",
                               "b", "broken.npz"), "wb") as f:
            f.write(b"not an npz")
        os.chdir(tmp)
        try:
            runpy.run_path(os.path.join(REF, "tools", "compress_amass.py"),
                           run_name="__main__")
        finally:
            os.chdir(here)
        with open(os.path.join(tmp, "data", "AMASS",
                               "all_motions_fps60.pkl"), "rb") as f:
            all_motions = pickle.load(f)
        data["compress_n_out"] = np.array(len(all_motions))
        for i, x in enumerate(all_motions):
            for k in ("trans", "poses", "dmpls"):
                data[f"compress_out_{i}_{k}"] = np.asarray(x[k])
            data[f"compress_out_{i}_fps"] = np.asarray(
                x["mocap_framerate"], dtype=np.float64)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- convert_amass: vid lengths chosen to cover a full 243-frame clip
    # with stride carry-over (300), a short vid hitting the RANDOM tail
    # resample (120; np.random seeded identically on both sides), and an
    # exact-length vid (243).
    joints_all = [rs.randn(17, n, 3).astype(np.float32)
                  for n in (300, 120, 243)]
    for i, j in enumerate(joints_all):
        data[f"amass_in_{i}"] = j
    data["amass_n_in"] = np.array(len(joints_all))
    data["amass_seed"] = np.array(16)

    tmp = tempfile.mkdtemp()
    try:
        os.makedirs(os.path.join(tmp, "data", "AMASS"), exist_ok=True)
        with open(os.path.join(tmp, "data", "AMASS",
                               "amass_joints_h36m_60.pkl"), "wb") as f:
            pickle.dump(joints_all, f)
        os.chdir(tmp)
        np.random.seed(16)
        try:
            runpy.run_path(os.path.join(REF, "tools", "convert_amass.py"),
                           run_name="__main__")
        finally:
            os.chdir(here)
        clip_dir = os.path.join(tmp, "data", "motion3d", "MB3D_f243s81",
                                "AMASS", "train")
        names = sorted(os.listdir(clip_dir))
        clips = []
        for name in names:
            with open(os.path.join(clip_dir, name), "rb") as f:
                d = pickle.load(f)
            assert d["data_input"] is None
            clips.append(d["data_label"])
        data["amass_clips"] = np.stack(clips).astype(np.float32)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    np.savez_compressed(os.path.join(OUT, "converters.npz"), **data)
    print("converter goldens written:",
          f"insta {data['insta_n_out']} motions,",
          f"compress {data['compress_n_out']} seqs,",
          f"amass {data['amass_clips'].shape} clips")


if __name__ == "__main__":
    golden_dstformer()
    golden_geometry()
    golden_rotations()
    golden_losses()
    golden_datareader()
    golden_action_dataset()
    golden_datasets_2d()
    golden_supcon()
    golden_legacy_attention()
    golden_mesh_eval()
    golden_converters()
    print("all goldens written to", OUT)
