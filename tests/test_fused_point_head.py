"""Fused Pallas per-point head vs the pure flax path: exact parity.

The fused kernel (ops/fused_point_head.py) must reproduce the flax
per-point stage (pre_sim MLP + view-token LoFTR layer + radiance blend,
reference ray_transformer.py:175-321) bit-for-bit within fp tolerance;
its custom backward is the reference VJP, asserted against flax grads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.config import Config
from uforecon_tpu.models.uforecon import UFORecon

from helpers import make_synthetic_scene


def _setup(fused):
    cfg = Config(
        ndepths=(8, 8, 8),
        fmt_layer_names=("self", "cross"),
        coarse_sample=6,
        fine_sample=6,
        volume_type="correlation",
        fused_point_head=fused,
    )
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16)
    # 8 rays exercise multiple kernel grid rows while keeping the
    # interpret-mode (CPU) wall time tolerable
    ray_d = jnp.asarray(extras["ray_d"][:8])
    model = UFORecon(cfg)
    return cfg, model, scene, ray_d


@pytest.mark.slow
def test_fused_matches_flax_forward():
    # slow: interpret-mode Pallas through the whole model forward (~250 s
    # cold on 1 CPU core). The kernel-level chunked-backward test below
    # stays in the fast set; on-chip parity is gated by script/chip_parity.py
    key = jax.random.PRNGKey(0)
    cfg, model, scene, ray_d = _setup("never")
    variables = jax.jit(model.init)(key, scene, ray_d[:4], key)

    # eager on purpose: under jit the ref and fused programs fuse
    # differently, and a ~1e-7 projection difference can flip an
    # in-bounds radiance mask on a boundary ray (0.07 rgb jump) — eager
    # keeps the shared math bit-identical so the comparison isolates the
    # kernel itself
    out_ref = model.apply(variables, scene, ray_d, key)

    cfg2, model2, _, _ = _setup("always")
    out_fused = model2.apply(variables, scene, ray_d, key)

    for stage in ("coarse", "fine"):
        np.testing.assert_allclose(
            np.asarray(out_fused[stage]["depth"]),
            np.asarray(out_ref[stage]["depth"]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out_fused[stage]["rgb"]),
            np.asarray(out_ref[stage]["rgb"]), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_grads_match_flax():
    # slow: interpret-mode fwd+bwd through the whole model (~505 s cold)
    key = jax.random.PRNGKey(0)
    cfg, model, scene, ray_d = _setup("never")
    variables = jax.jit(model.init)(key, scene, ray_d[:4], key)
    _, model_f, _, _ = _setup("always")

    def loss(mdl):
        def f(params):
            v = {**variables, "params": params}
            out = mdl.apply(v, scene, ray_d, key)
            return (jnp.mean(out["fine"]["rgb"]) +
                    jnp.mean(out["fine"]["depth"]))
        return f

    g_ref = jax.jit(jax.grad(loss(model)))(variables["params"])
    g_fused = jax.jit(jax.grad(loss(model_f)))(variables["params"])

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    checked = 0
    for path, leaf in flat_ref:
        other = flat_fused[path]
        np.testing.assert_allclose(
            np.asarray(other), np.asarray(leaf), rtol=5e-3, atol=1e-5,
            err_msg=str(path))
        checked += 1
    assert checked > 10


@pytest.mark.slow
def test_chunked_backward_matches_direct(monkeypatch, rng):
    """The scanned segment backward must equal one whole-chunk vjp.

    slow: interpret-mode Pallas vjp x2 (~30 s on the 1-core CPU host)."""
    from uforecon_tpu.ops import fused_point_head as fph

    nv, c_img, n = 3, 8, 50
    c = 8 + 4 + 4 + 8  # img + vol + sim16(4) + the in-kernel NeRF PE's 8
    key = jax.random.PRNGKey(1)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    inp = fph.PointHeadInputs(
        img_feat=r(nv, 8, n), vol_feat=r(4, n), sim_feat=r(8, n),
        depth_dist=r(nv, n), dir_rel=r(nv, 3, n), rgb=r(nv, 3, n),
        mask=jnp.ones((nv, n)),
    )
    p = fph.PointHeadParams(
        view_token=r(c), wq=r(c, c), wk=r(c, c), wv=r(c, c), wmerge=r(c, c),
        norm1_scale=r(c), norm1_bias=r(c), w1=r(2 * c, 2 * c),
        w2=r(2 * c, c), norm2_scale=r(c), norm2_bias=r(c),
        sim_w=(r(8, 16), r(16, 16), r(16, 4)),
        sim_b=(r(16), r(16), r(4)),
        rad_w=(r(c + 3, 16), r(16, 8), r(8, 1)),
        rad_b=(r(16), r(8), r(1)),
    )
    n_heads = 4

    def loss_direct(inp, p):
        t, rad = fph.point_head_reference(inp, p, n_heads)
        return jnp.sum(t * 0.01) + jnp.sum(rad)

    g_ref = jax.grad(loss_direct, argnums=(0, 1))(inp, p)

    monkeypatch.setattr(fph, "_BWD_CHUNK", 16)

    def loss_fused(inp, p):
        t, rad = fph.point_head(inp, p, n_heads)
        return jnp.sum(t * 0.01) + jnp.sum(rad)

    g_chunked = jax.grad(loss_fused, argnums=(0, 1))(inp, p)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_chunked)):
        # segment accumulation reorders float sums vs the single vjp; the
        # depth-PE chain rule multiplies that noise by up to 8*pi
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=5e-4)
