"""Pallas tiny-sequence linear attention vs the einsum reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.models.attention import linear_attention
from uforecon_tpu.ops.pallas_attention import tiny_linear_attention


def _ref_linear_attention(q, k, v):
    """Direct quadratic-order reference (same math as models.attention)."""
    qf = jax.nn.elu(q) + 1.0
    kf = jax.nn.elu(k) + 1.0
    scores = jnp.einsum("blhd,bshd->blsh", qf, kf)
    denom = jnp.sum(scores, axis=2, keepdims=True) + 1e-6
    return jnp.einsum("blsh,bshm->blhm", scores / denom, v)


@pytest.mark.parametrize("b,l,s,h,d,m", [
    (300, 4, 4, 8, 10, 10),     # view-transformer shape (ragged block)
    (256, 6, 6, 8, 10, 10),     # 5-view test config
    (512, 4, 4, 8, 11, 11),     # ray-transformer head dim
])
def test_forward_matches_reference(rng, b, l, s, h, d, m):
    q = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, m)).astype(np.float32))
    got = tiny_linear_attention(q, k, v)
    want = _ref_linear_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_matches_models_attention_path(rng):
    """models.attention.linear_attention (small-S branch) agrees."""
    b, l, h, d = 200, 4, 8, 10
    q = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tiny_linear_attention(q, k, v)),
        np.asarray(linear_attention(q, k, v)),
        rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(rng):
    b, l, s, h, d, m = 64, 4, 4, 4, 6, 6
    q = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, m)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, l, h, m)).astype(np.float32))

    loss_p = lambda q, k, v: jnp.sum((tiny_linear_attention(q, k, v) - t) ** 2)
    loss_r = lambda q, k, v: jnp.sum((_ref_linear_attention(q, k, v) - t) ** 2)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_jit_and_odd_batch(rng):
    b = 257  # forces padding
    q = jnp.asarray(rng.standard_normal((b, 4, 8, 10)).astype(np.float32))
    out = jax.jit(tiny_linear_attention)(q, q, q)
    assert out.shape == (b, 4, 8, 10)
    assert np.all(np.isfinite(np.asarray(out)))
