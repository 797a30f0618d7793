"""Fused cross-view volume-fusion Pallas kernel vs the XLA chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.ops.fused_volume_fusion import (volume_fusion,
                                                  volume_fusion_fused,
                                                  volume_fusion_reference)


def _stages(rng, nv=3, n=300, f=8, s=3, weight_scale=1.0):
    # sigmoid-range weights like CostRegNetWeight emits
    fws = []
    for _ in range(s):
        feat = rng.standard_normal((nv, n, f)).astype(np.float32)
        w = (rng.random((nv, n, 1)) * weight_scale).astype(np.float32)
        fws.append(jnp.asarray(np.concatenate([feat, w], axis=-1)))
    return fws


@pytest.mark.parametrize("nv,s", [(2, 3), (3, 3), (3, 1)])
def test_fused_matches_reference(rng, nv, s):
    fws = _stages(rng, nv=nv, s=s)
    ref = volume_fusion_reference(fws)
    out = volume_fusion_fused(fws)
    assert out.shape == ref.shape == (300, s * 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_zero_weights_no_nan(rng):
    """All-zero weights (points outside every frustum) stay finite."""
    fws = _stages(rng, weight_scale=0.0)
    out = volume_fusion_fused(fws)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(volume_fusion_reference(fws)),
                               rtol=1e-5, atol=1e-7)


def test_gradients_match_reference(rng):
    fws = _stages(rng, n=40)
    w = jnp.asarray(rng.standard_normal((40, 24)).astype(np.float32))

    g_fused = jax.grad(
        lambda *xs: jnp.sum(volume_fusion(*xs) * w), argnums=(0, 1, 2))(*fws)
    g_ref = jax.grad(
        lambda *xs: jnp.sum(volume_fusion_reference(xs) * w),
        argnums=(0, 1, 2))(*fws)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # whole-model interpret-mode pass (~40 s cold CPU);
# the kernel ships default-off (BASELINE round-3 A/B) and has fast
# kernel-level parity above
def test_model_fused_volume_fusion_matches(rng):
    """Full render chunk with the fused view fusion == the XLA chain."""
    from helpers import make_synthetic_scene

    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    def cfg(fused):
        return Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                      coarse_sample=6, fine_sample=6,
                      volume_type="correlation", fused_point_head="never",
                      fused_volume_fusion=fused)

    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16)
    ray_d = jnp.asarray(extras["ray_d"][:8])
    key = jax.random.PRNGKey(0)
    model = UFORecon(cfg("never"))
    variables = jax.jit(model.init)(key, scene, ray_d[:4], key)

    out_ref = model.apply(variables, scene, ray_d, key)
    out_fused = UFORecon(cfg("always")).apply(variables, scene, ray_d, key)
    for stage in ("coarse", "fine"):
        for k in ("depth", "rgb"):
            np.testing.assert_allclose(
                np.asarray(out_fused[stage][k]),
                np.asarray(out_ref[stage][k]), rtol=2e-4, atol=2e-4)
