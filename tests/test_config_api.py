"""Config system (!include, attr access) and the public MotionBERT API."""

import os

import numpy as np
import pytest

from motionbert_tpu.core.config import ConfigDict, get_config


def test_config_include_and_attrs(tmp_path):
    base = os.path.join(tmp_path, "base.yaml")
    with open(base, "w") as f:
        f.write("dim_feat: 64\nnested:\n  a: 1\n")
    main = os.path.join(tmp_path, "main.yaml")
    with open(main, "w") as f:
        f.write("base: !include base.yaml\nepochs: 3\n")
    cfg = get_config(main)
    assert cfg.name == "main"
    assert cfg.epochs == 3
    assert cfg.base.dim_feat == 64
    assert cfg.base.nested.a == 1
    # dict surface intact
    assert cfg.get("missing", "fallback") == "fallback"
    with pytest.raises(AttributeError):
        _ = cfg.nope


def test_configdict_setdefaults():
    c = ConfigDict(dict(a=1)).setdefaults(a=2, b=3)
    assert c.a == 1 and c.b == 3


def test_shipped_configs_load():
    import glob

    paths = glob.glob("configs/**/*.yaml", recursive=True)
    assert len(paths) >= 15
    for p in paths:
        cfg = get_config(p)
        assert "maxlen" in cfg, p


@pytest.mark.slow
def test_motionbert_api(tmp_path):
    import yaml

    from motionbert_tpu.api import MotionBERT

    cfg_path = os.path.join(tmp_path, "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(dict(dim_feat=32, dim_rep=32, depth=1, num_heads=4,
                            mlp_ratio=2, maxlen=16, num_joints=17), f)
    mb = MotionBERT.from_config(cfg_path)
    x = np.random.RandomState(0).uniform(-1, 1, (2, 9, 17, 3))
    rep = mb.get_representation(x)
    assert rep.shape == (2, 9, 17, 32)
    pose = mb.lift(x)
    assert pose.shape == (2, 9, 17, 3)
    assert (pose[:, :, 0] == 0).all()  # rootrel default

    # single clip without batch dim is accepted
    rep1 = mb.get_representation(x[0])
    np.testing.assert_allclose(rep1[0], rep[0], atol=1e-6)

    # F > maxlen gives a clear error
    with pytest.raises(AssertionError, match="maxlen"):
        mb.get_representation(np.zeros((1, 99, 17, 3)))


def test_factory_compute_dtype_resolution():
    """load_backbone resolves compute dtype: explicit `bf16` key wins, else
    backend default (f32 on the CPU test backend); explicit compute_dtype
    argument overrides everything (the parity-gate path)."""
    import jax.numpy as jnp

    from motionbert_tpu.core.config import ConfigDict
    from motionbert_tpu.models.factory import (
        default_compute_dtype, load_backbone)

    base = dict(dim_feat=32, dim_rep=32, depth=1, num_heads=4, mlp_ratio=2,
                maxlen=16, num_joints=17)
    assert default_compute_dtype() == jnp.float32  # CPU backend in tests
    assert load_backbone(ConfigDict(base)).dtype == jnp.float32
    assert load_backbone(
        ConfigDict(dict(base, bf16=True))).dtype == jnp.bfloat16
    assert load_backbone(
        ConfigDict(dict(base, bf16=False))).dtype == jnp.float32
    assert load_backbone(ConfigDict(dict(base, bf16=True)),
                         compute_dtype=jnp.float32).dtype == jnp.float32
