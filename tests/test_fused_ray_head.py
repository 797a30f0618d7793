"""Parity of the fused along-ray Pallas kernel vs the flax path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import fused_fwd_tol
from uforecon_tpu.models.ray_transformer import RayTransformer
from uforecon_tpu.ops.fused_ray_head import (RayHeadParams, ray_head,
                                             ray_head_fused,
                                             ray_head_reference)


def _params(key, c=96, heads=8):
    ks = jax.random.split(key, 16)
    n = jax.random.normal
    return RayHeadParams(
        wq=n(ks[0], (c, c)) / np.sqrt(c), wk=n(ks[1], (c, c)) / np.sqrt(c),
        wv=n(ks[2], (c, c)) / np.sqrt(c), wmerge=n(ks[3], (c, c)) / np.sqrt(c),
        norm1_scale=1.0 + 0.1 * n(ks[4], (c,)), norm1_bias=0.1 * n(ks[5], (c,)),
        w1=n(ks[6], (2 * c, 2 * c)) / np.sqrt(2 * c),
        w2=n(ks[7], (2 * c, c)) / np.sqrt(2 * c),
        norm2_scale=1.0 + 0.1 * n(ks[8], (c,)), norm2_bias=0.1 * n(ks[9], (c,)),
        dens_w=(n(ks[10], (c, 32)) / np.sqrt(c), n(ks[11], (32, 16)) / 5.7,
                n(ks[12], (16, 1)) / 4.0),
        dens_b=(0.1 * n(ks[13], (32,)), 0.1 * n(ks[14], (16,)),
                0.1 * n(ks[15], (1,))),
    )


@pytest.mark.parametrize("rn,sn", [
    (7, 64),
    pytest.param(5, 128, marks=pytest.mark.slow),   # shape variants move
    pytest.param(16, 32, marks=pytest.mark.slow),   # to the slow set (~35 s
                                                    # interpret-mode each)
])
def test_fused_matches_reference(rn, sn):
    key = jax.random.PRNGKey(0)
    p = _params(jax.random.PRNGKey(1))
    y = jax.random.normal(key, (rn, sn, 96), jnp.float32)
    ref = ray_head_reference(y, p)
    got = ray_head_fused(y, p)
    assert got.shape == (rn, sn)
    rtol, atol = fused_fwd_tol()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=rtol, atol=atol)


def test_fused_matches_flax_module():
    """The kernel must reproduce RayTransformer.along_ray exactly (same
    params, same PE concat)."""
    key = jax.random.PRNGKey(2)
    rt = RayTransformer(fused="never")
    token = jax.random.normal(key, (6, 64, rt.d_view), jnp.float32)
    # init via a along_ray-only apply
    variables = rt.init(key, token, method=rt.along_ray)
    ref = rt.apply(variables, token, method=rt.along_ray)
    rt_fused = RayTransformer(fused="always")
    got = rt_fused.apply(variables, token, method=rt_fused.along_ray)
    rtol, atol = fused_fwd_tol()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=rtol, atol=atol)


@pytest.mark.slow  # interpret-mode fwd+bwd (~23 s cold CPU); forward
# parity stays fast above and the on-chip grad gate is chip_parity.py
def test_gradients_match_reference():
    p = _params(jax.random.PRNGKey(3))
    y = jax.random.normal(jax.random.PRNGKey(4), (3, 32, 96), jnp.float32)

    def loss_fused(y, p):
        return jnp.sum(jnp.sin(ray_head(y, p)))

    def loss_ref(y, p):
        return jnp.sum(jnp.sin(ray_head_reference(y, p)))

    gy_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(y, p)
    gy_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(y, p)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               rtol=5e-4, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp_f),
                    jax.tree_util.tree_leaves(gp_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
