"""Golden parity for pose losses vs the reference torch implementations."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from motionbert_tpu.losses import (
    loss_mpjpe, weighted_mpjpe, loss_2d_weighted, n_mpjpe, loss_velocity,
    loss_limb_var, loss_limb_gt, loss_angle, loss_angle_velocity,
    pose3d_total_loss,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "losses.npz"))


@pytest.mark.parametrize("name,fn,args", [
    ("loss_mpjpe", loss_mpjpe, ("pred", "gt")),
    ("weighted_mpjpe", weighted_mpjpe, ("pred", "gt", "w")),
    ("n_mpjpe", n_mpjpe, ("pred", "gt")),
    ("loss_velocity", loss_velocity, ("pred", "gt")),
    ("loss_limb_var", loss_limb_var, ("pred",)),
    ("loss_limb_gt", loss_limb_gt, ("pred", "gt")),
    ("loss_angle", loss_angle, ("pred", "gt")),
    ("loss_angle_velocity", loss_angle_velocity, ("pred", "gt")),
    ("loss_2d_weighted", loss_2d_weighted, ("pred", "gt", "conf")),
])
def test_loss_golden(g, name, fn, args):
    out = fn(*(jnp.asarray(g[a]) for a in args))
    np.testing.assert_allclose(float(out), float(g[name]), rtol=2e-5)


def test_single_frame_degenerate(g):
    pred = jnp.asarray(g["pred"][:, :1])
    gt = jnp.asarray(g["gt"][:, :1])
    assert float(loss_velocity(pred, gt)) == 0.0
    assert float(loss_limb_var(pred)) == 0.0
    assert float(loss_angle_velocity(pred, gt)) == 0.0


def test_total_loss_composition(g):
    lambdas = dict(lambda_scale=0.5, lambda_3d_velocity=20.0, lambda_lv=0.0,
                   lambda_lg=0.0, lambda_a=0.0, lambda_av=0.0)
    total, terms = pose3d_total_loss(jnp.asarray(g["pred"]),
                                     jnp.asarray(g["gt"]), lambdas)
    expect = (float(g["loss_mpjpe"]) + 0.5 * float(g["n_mpjpe"])
              + 20.0 * float(g["loss_velocity"]))
    np.testing.assert_allclose(float(total), expect, rtol=2e-5)
    assert set(terms) == {"3d_pos", "3d_scale", "3d_velocity", "lv", "lg",
                          "angle", "angle_velocity", "total"}
