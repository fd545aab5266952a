"""Full-model gradient parity through the fused Pallas forward+backward
kernels (C=128 so the lane-aligned fused path actually engages; interpret
mode on CPU runs the real kernel code)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from motionbert_tpu.models.dstformer import DSTformer

CFG = dict(dim_in=3, dim_out=3, dim_feat=128, dim_rep=128, depth=1,
           num_heads=4, mlp_ratio=2, num_joints=17, maxlen=9)


@pytest.mark.slow
def test_model_grads_fused_vs_xla():
    mx = DSTformer(attn_impl="xla", **CFG)
    mp = DSTformer(attn_impl="pallas", **CFG)
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, 9, 17, 3)),
                    jnp.float32)
    v = mx.init(jax.random.PRNGKey(0), x)

    def loss(model):
        return lambda p: jnp.sum(model.apply({"params": p}, x) ** 2)

    out_x = mx.apply(v, x)
    out_p = mp.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=3e-5)

    g_x = jax.grad(loss(mx))(v["params"])
    g_p = jax.grad(loss(mp))(v["params"])
    flat_x = jtu.tree_flatten_with_path(g_x)[0]
    flat_p = dict(jtu.tree_flatten_with_path(g_p)[0])
    for path, gx in flat_x:
        gp = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=2e-4, rtol=2e-4,
            err_msg=jtu.keystr(path))
