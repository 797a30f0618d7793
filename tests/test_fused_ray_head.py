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


@pytest.mark.slow  # default-off probe kernel; interpret mode is slow
def test_ray_head_neus_epilogue_matches_reference(rng):
    """Round-5 probe: the fused NeuS epilogue (in-kernel midpoint
    intervals, sigmoids, log-space exclusive cumprod, reductions) must
    match ray-head reference + ops/rendering.neus_render."""
    import jax
    import jax.numpy as jnp

    from uforecon_tpu.ops.fused_ray_head import (
        RayHeadParams, _interval_mid_matrix, ray_head_neus,
        ray_head_neus_reference)

    rn, sn, c, nh = 12, 16, 96, 8
    # interval matrix == neus_render's midpoint intervals exactly
    z1 = np.sort(rng.random((5, sn)).astype(np.float32) * 3 + 2, axis=1)
    interval = z1[:, 1:] - z1[:, :-1]
    padded = np.concatenate([interval[:, :1], interval, interval[:, -1:]], 1)
    mid_ref = (padded[:, :-1] + padded[:, 1:]) * 0.5
    np.testing.assert_allclose(z1 @ _interval_mid_matrix(sn), mid_ref,
                               atol=1e-6)

    y = rng.standard_normal((rn, sn, c)).astype(np.float32) * 0.5
    rad = rng.random((rn, sn, 3)).astype(np.float32)
    z = np.sort(rng.random((rn, sn)).astype(np.float32) * 2 + 2, axis=1)
    inv_s = jnp.float32(np.exp(0.3 * 10))

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.2)

    p = RayHeadParams(
        wq=mk((c, c)), wk=mk((c, c)), wv=mk((c, c)), wmerge=mk((c, c)),
        norm1_scale=jnp.ones(c), norm1_bias=jnp.zeros(c),
        w1=mk((2 * c, 2 * c)), w2=mk((2 * c, c)),
        norm2_scale=jnp.ones(c), norm2_bias=jnp.zeros(c),
        dens_w=(mk((c, 32)), mk((32, 16)), mk((16, 1))),
        dens_b=(mk((32,)), mk((16,)), mk((1,))),
    )
    got = ray_head_neus(jnp.asarray(y), jnp.asarray(z), jnp.asarray(rad),
                        inv_s, p, nh)
    ref = ray_head_neus_reference(jnp.asarray(y), jnp.asarray(z),
                                  jnp.asarray(rad), inv_s, p, nh)
    for name, a, b in zip(("srdf", "weight", "rgb", "depth", "opacity"),
                          got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)

    # backward IS the reference vjp (same custom-VJP pattern as ray_head):
    # cotangent through rgb must match autodiff of the reference exactly
    def loss_fused(yy, ss):
        out = ray_head_neus(yy, jnp.asarray(z), jnp.asarray(rad), ss, p, nh)
        return jnp.sum(out[2] ** 2) + jnp.sum(out[3])

    def loss_ref(yy, ss):
        out = ray_head_neus_reference(yy, jnp.asarray(z), jnp.asarray(rad),
                                      ss, p, nh)
        return jnp.sum(out[2] ** 2) + jnp.sum(out[3])

    g_f = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(y), inv_s)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(y), inv_s)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
