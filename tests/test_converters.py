"""Converter-output parity: the repo's offline dataset converters
(tools/convert_insta.py, tools/compress_amass.py, tools/convert_amass.py)
rerun on the SAME synthetic inputs the reference converters were run on
(tools/make_goldens.golden_converters) and must produce identical outputs
— the r3 datasets_2d pattern, closing the shared-misreading risk for the
converter chain (reference tools/convert_insta.py, compress_amass.py,
convert_amass.py:21-67)."""

import os
import pickle

import numpy as np
import pytest

GOLD_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                         "converters.npz")


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD_PATH)


def test_convert_insta_matches_reference(gold, tmp_path):
    from tools.convert_insta import convert_action, write_track_tree

    tree = []
    for i in range(int(gold["insta_n_clips"])):
        rel = str(gold[f"insta_rel_{i}"])
        arr = gold[f"insta_raw_{i}"] if f"insta_raw_{i}" in gold else None
        tree.append((rel, arr))
    root = tmp_path / "tracks"
    write_track_tree(str(root / "golden_action"), tree)

    convert_action(str(root), "golden_action")
    with open(root / "golden_action" / "golden_action.pkl", "rb") as f:
        motions = pickle.load(f)

    n_out = int(gold["insta_n_out"])
    assert len(motions) == n_out  # empty clip dir skipped, degenerate kept
    for i in range(n_out):
        np.testing.assert_allclose(motions[i], gold[f"insta_out_{i}"],
                                   atol=1e-12, rtol=1e-12)
    # the degenerate clip (crop_scale's <4-valid-coords path) is all-zero
    assert not np.any(motions[-1])


def test_compress_amass_matches_reference(gold, tmp_path):
    """Content parity (strided arrays, sequence order, fps rewrite); the
    reference's fname_new mangling is path-prefix cosmetics, deliberately
    not reproduced."""
    from tools.compress_amass import compress_amass

    raw_dir = tmp_path / "raw"
    for i in range(int(gold["compress_n_seqs"])):
        rel = str(gold[f"compress_rel_{i}"])
        p = raw_dir / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        np.savez(p, gender=np.str_("male"),
                 betas=gold[f"compress_in_{i}_betas"],
                 **{k: gold[f"compress_in_{i}_{k}"]
                    for k in ("mocap_framerate", "trans", "poses", "dmpls")})
    (raw_dir / "b").mkdir(parents=True, exist_ok=True)
    (raw_dir / "b" / "broken.npz").write_bytes(b"not an npz")

    out_pkl = tmp_path / "all_motions.pkl"
    compress_amass(str(raw_dir), str(tmp_path / "fps60"), str(out_pkl),
                   str(tmp_path / "fps.csv"))
    with open(out_pkl, "rb") as f:
        all_motions = pickle.load(f)

    assert len(all_motions) == int(gold["compress_n_out"])  # corrupt skipped
    for i, x in enumerate(all_motions):
        for k in ("trans", "poses", "dmpls"):
            np.testing.assert_array_equal(np.asarray(x[k]),
                                          gold[f"compress_out_{i}_{k}"])
        assert float(x["mocap_framerate"]) == \
            float(gold[f"compress_out_{i}_fps"])


def test_convert_amass_matches_reference(gold, tmp_path):
    """Axis remap, 0.298 scale, split_clips slicing (incl. the RANDOM tail
    resample of the 120-frame vid — both sides seeded identically), and
    the file-per-clip pkl layout."""
    from tools.convert_amass import convert_amass

    joints_all = [gold[f"amass_in_{i}"]
                  for i in range(int(gold["amass_n_in"]))]
    joints_pkl = tmp_path / "amass_joints_h36m_60.pkl"
    with open(joints_pkl, "wb") as f:
        pickle.dump(joints_all, f)

    np.random.seed(int(gold["amass_seed"]))
    out_root = tmp_path / "MB3D_f243s81" / "AMASS"
    convert_amass(str(joints_pkl), str(out_root))

    clip_dir = out_root / "train"
    names = sorted(os.listdir(clip_dir))
    ref_clips = gold["amass_clips"]
    assert len(names) == len(ref_clips)
    assert names[0] == "00000000.pkl"  # reference file naming
    for name, ref in zip(names, ref_clips):
        with open(clip_dir / name, "rb") as f:
            d = pickle.load(f)
        assert d["data_input"] is None
        np.testing.assert_allclose(np.asarray(d["data_label"]), ref,
                                   atol=1e-7, rtol=1e-7)
