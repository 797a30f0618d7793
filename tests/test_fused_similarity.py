"""Fused grouped-cosine Pallas kernel vs the XLA query_similarity loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.ops.fused_similarity import (grouped_cosine,
                                               grouped_cosine_fused,
                                               grouped_cosine_reference,
                                               pair_slots, view_pairs)


@pytest.mark.parametrize("nv", [2, 3, 4])
def test_fused_matches_reference(rng, nv):
    c, n_groups = 32, 8
    n = 300  # non-multiple of the kernel block: exercises padding
    sampled = jnp.asarray(
        rng.standard_normal((nv, n, (nv - 1) * c)).astype(np.float32))
    ref = grouped_cosine_reference(sampled, n_groups)
    out = grouped_cosine_fused(sampled, n_groups)
    assert out.shape == (n, n_groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # cosines live in [-1, 1]
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-5)


def test_reference_matches_query_similarity_loop(rng):
    """The kernel's reference impl == the inline XLA loop in
    query_similarity (same slot layout, eps, pair mean)."""
    nv, c, n_groups = 3, 32, 8
    n = 64
    sampled = jnp.asarray(
        rng.standard_normal((nv, n, (nv - 1) * c)).astype(np.float32))

    pairs = view_pairs(nv)
    slots = [[] for _ in range(nv)]
    for p, (i, j) in enumerate(pairs):
        slots[i].append((0, p))
        slots[j].append((1, p))

    def view_slot(v, key):
        k = slots[v].index(key)
        return sampled[v, :, k * c:(k + 1) * c]

    cos_all = []
    for p, (i, j) in enumerate(pairs):
        gi = view_slot(i, (0, p)).reshape(n, n_groups, c // n_groups)
        gj = view_slot(j, (1, p)).reshape(n, n_groups, c // n_groups)
        dot = jnp.sum(gi * gj, axis=-1)
        ni = jnp.sqrt(jnp.sum(gi * gi, axis=-1))
        nj = jnp.sqrt(jnp.sum(gj * gj, axis=-1))
        cos_all.append(dot / jnp.maximum(ni * nj, 1e-8))
    loop = jnp.mean(jnp.stack(cos_all), axis=0)

    ref = grouped_cosine_reference(sampled, n_groups)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(loop),
                               rtol=1e-6, atol=1e-7)

    # and the slot bookkeeping agrees with the kernel's closed form
    ks = pair_slots(nv)
    for p, (i, j) in enumerate(pairs):
        assert ks[p] == (slots[i].index((0, p)), slots[j].index((1, p)))


def test_gradients_match_reference(rng):
    nv, c, n_groups = 3, 32, 8
    n = 40
    sampled = jnp.asarray(
        rng.standard_normal((nv, n, (nv - 1) * c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, n_groups)).astype(np.float32))

    g_fused = jax.grad(
        lambda s: jnp.sum(grouped_cosine(s, n_groups) * w))(sampled)
    g_ref = jax.grad(
        lambda s: jnp.sum(grouped_cosine_reference(s, n_groups) * w))(sampled)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # whole-model interpret-mode pass (~40 s cold CPU);
# the kernel ships default-off (BASELINE round-3 A/B) and has fast
# kernel-level parity above
def test_model_fused_similarity_matches(rng):
    """Full render chunk with the fused cosine == the XLA loop."""
    from helpers import make_synthetic_scene

    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    def cfg(fused):
        return Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                      coarse_sample=6, fine_sample=6,
                      volume_type="correlation", fused_point_head="never",
                      fused_similarity=fused)

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


def test_query_similarity_fused_routing(rng):
    """fused='always' through query_similarity == fused='never'."""
    from uforecon_tpu.models.ray_transformer import query_similarity

    nv, c = 3, 32
    h = w = 16
    points = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
    poses = []
    for i in range(nv):
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.1 * i
        p[2, 3] = 4.0
        poses.append(p)
    poses = jnp.asarray(np.stack(poses))
    n_pairs = nv * (nv - 1) // 2
    aug0 = jnp.asarray(
        rng.standard_normal((n_pairs, h, w, c)).astype(np.float32))
    aug1 = jnp.asarray(
        rng.standard_normal((n_pairs, h, w, c)).astype(np.float32))

    f_ref, xy_ref, v_ref = query_similarity(points, poses, aug0, aug1, nv,
                                            fused="never")
    f_fused, xy_f, v_f = query_similarity(points, poses, aug0, aug1, nv,
                                          fused="always")
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(xy_f), np.asarray(xy_ref))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_ref))
