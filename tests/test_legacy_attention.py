"""Legacy attention variants (series/parallel/coupling/vanilla) and the
stage_para Block vs reference goldens."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.models.convert import torch_state_dict_to_flax
from motionbert_tpu.models.dstformer import Attention, Block

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "legacy_attention.npz"))


def _inputs(g):
    x = g["x"]  # (B*F, J, C) in reference layout
    F = int(g["F"])
    BF, J, C = x.shape
    return x.reshape(BF // F, F, J, C), F, C


@pytest.mark.parametrize("mode", ["spatial", "temporal", "vanilla",
                                  "coupling", "series", "parallel"])
def test_legacy_mode_parity(g, mode):
    x4, F, C = _inputs(g)
    sd = {k.split(":sd:")[1]: g[k] for k in g.files
          if k.startswith(f"{mode}:sd:")}
    variables = torch_state_dict_to_flax(sd)
    attn = Attention(dim=C, num_heads=4, mode=mode)
    out = attn.apply(variables, jnp.asarray(x4))
    ref = g[f"{mode}:out"].reshape(out.shape)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_stage_para_block_parity(g):
    x4, F, C = _inputs(g)
    sd = {k.split(":sd:")[1]: g[k] for k in g.files
          if k.startswith("stage_para:sd:")}
    variables = torch_state_dict_to_flax(sd)
    blk = Block(dim=C, num_heads=4, mlp_ratio=2, st_mode="stage_para",
                att_fuse=True)
    out = blk.apply(variables, jnp.asarray(x4))
    ref = g["stage_para:out"].reshape(out.shape)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
