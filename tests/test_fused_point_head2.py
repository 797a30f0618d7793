"""Parity of the point-major (v2) fused per-point head vs the reference.

v2 (ops/fused_point_head2.py) consumes the raw (NV, P, C) gather-output
layout.  It measured slower end-to-end than v1 on v5e (26.1k vs 29.3k
rays/s) and is kept behind UFO_POINT_HEAD=v2 for re-measurement; these
small-P tests keep it correct.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from helpers import fused_fwd_tol
from uforecon_tpu.ops import fused_point_head as fph
from uforecon_tpu.ops import fused_point_head2 as fph2


def _make(rng, nv=3, n=37):
    c_img, c_vol, c_pe = 8, 4, 8  # pe width is the in-kernel NeRF PE's 8
    c = c_img + c_vol + 4 + c_pe  # sim16 width shrunk to 4 for speed

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    inp = fph2.PointHeadInputs2(
        img_feat=r(nv, n, c_img), vol_feat=r(n, c_vol), sim_feat=r(n, 8),
        depth_dist=r(nv, n), dir_rel=r(nv, n, 3), rgb=r(nv, n, 3),
        mask=jnp.asarray(rng.integers(0, 2, (nv, n)).astype(np.float32)),
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
    return inp, p


@pytest.mark.slow  # interpret-mode whole head (~15 s cold CPU); v2 is the
# measured-slower layout kept only for re-measurement (BASELINE.md)
def test_v2_fused_matches_reference(rng):
    inp, p = _make(rng)
    tok_f, rad_f = fph2.point_head2_fused(inp, p, n_heads=4)
    tok_r, rad_r = fph2.point_head2_reference(inp, p, n_heads=4)
    assert tok_f.shape == tok_r.shape and rad_f.shape == (37, 3)
    rtol, atol = fused_fwd_tol()
    np.testing.assert_allclose(np.asarray(tok_f), np.asarray(tok_r),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(rad_f), np.asarray(rad_r),
                               rtol=rtol, atol=atol)


@pytest.mark.slow  # interpret-mode fwd+bwd (~42 s cold CPU); v2 is the
# measured-slower layout kept for re-measurement (BASELINE.md)
def test_v2_gradients_match_reference(rng):
    inp, p = _make(rng, n=21)

    def loss(head):
        def f(inp, p):
            t, rad = head(inp, p, 4)
            return jnp.sum(t * 0.01) + jnp.sum(rad)
        return f

    g_f = jax.grad(loss(fph2.point_head2), argnums=(0, 1))(inp, p)
    g_r = jax.grad(loss(fph2.point_head2_reference), argnums=(0, 1))(inp, p)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)
