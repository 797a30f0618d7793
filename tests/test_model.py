"""End-to-end model smoke test on a tiny synthetic scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.config import Config
from uforecon_tpu.models.uforecon import UFORecon

from helpers import make_synthetic_scene


@pytest.mark.slow
def test_model_encode_and_render(rng):
    cfg = Config(
        ndepths=(8, 8, 8),
        fmt_layer_names=("self", "cross"),
        coarse_sample=8,
        fine_sample=8,
        volume_reso=96,
        volume_type="correlation",
    )
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    rn = 16
    ray_d = extras["ray_d"][:rn]

    variables = jax.jit(model.init)(key, scene, ray_d, key)
    out = model.apply(variables, scene, ray_d, key)

    for phase in ("coarse", "fine"):
        o = out[phase]
        assert o["rgb"].shape == (rn, 3)
        assert o["depth"].shape == (rn,)
        assert np.all(np.isfinite(np.asarray(o["rgb"])))
        assert np.all(np.isfinite(np.asarray(o["depth"])))
        assert np.asarray(o["opacity"]).min() >= 0
        assert np.asarray(o["opacity"]).max() <= 1 + 1e-4
    assert out["fine"]["weight"].shape == (rn, 16)  # coarse+fine merged
    # rendered rgb is a convex blend of sampled image colors -> within [0,1]
    assert np.asarray(out["fine"]["rgb"]).min() >= -1e-4
    assert np.asarray(out["fine"]["rgb"]).max() <= 1 + 1e-4


@pytest.mark.slow
def test_featuregrid_volume_path(rng):
    """The alternative --volume_type featuregrid path renders end to end
    (reference feature_volume.py:40-97)."""
    cfg = Config(
        ndepths=(8, 8, 8),
        fmt_layer_names=("self", "cross"),
        coarse_sample=8,
        fine_sample=8,
        volume_type="featuregrid",
        volume_reso=16,
        fea_volume_dim=16,
    )
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, scene, extras["ray_d"][:8], key)
    out = jax.jit(
        lambda v, s, r, k: model.apply(v, s, r, k)
    )(variables, scene, extras["ray_d"][:8], jax.random.PRNGKey(1))
    assert out["fine"]["rgb"].shape == (8, 3)
    assert np.all(np.isfinite(np.asarray(out["fine"]["depth"])))


@pytest.mark.slow
def test_mvs_pretrain_step(rng):
    """Cascade pretraining step: entropy loss is finite, matcher params AND
    BN stats update (the reference relies on a pretrained TransMVSNet ckpt;
    we train it — trainer.py make_mvs_pretrain_step)."""
    from uforecon_tpu.pipeline.trainer import (create_train_state,
                                               make_mvs_pretrain_step)
    import optax

    cfg = Config(
        ndepths=(8, 8, 8),
        fmt_layer_names=("self", "cross"),
        coarse_sample=8,
        fine_sample=8,
        volume_type="correlation",
    )
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, scene, extras["ray_d"][:8], key)

    tx = optax.adam(1e-3)
    state = create_train_state(cfg, variables)
    state = state._replace(opt_state=tx.init(state.params))
    step = make_mvs_pretrain_step(cfg, model, tx)

    depth_gt = jnp.full((32, 32), float(scene.near) + 0.5)
    mask = jnp.ones((32, 32))
    new_state, logs = step(state, scene, depth_gt, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["mvs/loss"]))
    before = jax.tree_util.tree_leaves(state.params["matcher"])
    after = jax.tree_util.tree_leaves(new_state.params["matcher"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_query_similarity_merged_matches_naive(rng):
    """The one-gather-per-view merged similarity must equal per-pair
    sampling (reference model.py:218-305 semantics)."""
    from uforecon_tpu.models.ray_transformer import query_similarity
    from uforecon_tpu.ops.grid_sample import (grid_sample_2d_packed,
                                              pack_image_corners)

    nv, h, w, c = 4, 12, 16, 32
    p = nv * (nv - 1) // 2
    aug0 = jnp.asarray(rng.standard_normal((p, h, w, c)).astype(np.float32))
    aug1 = jnp.asarray(rng.standard_normal((p, h, w, c)).astype(np.float32))
    # random projective poses with positive-depth points in front
    scene, _ = make_synthetic_scene(n_views=nv, h=h, w=w)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (6, 5, 3)).astype(np.float32))

    sim, xy, valid = query_similarity(pts, scene.source_poses, aug0, aug1, nv,
                                      pair_quirk=False)

    # naive reference: per-pair gathers + grouped cosine, mean over pairs
    pairs = [(a, b) for a in range(nv - 1) for b in range(a + 1, nv)]
    cos_all = []
    for k, (i, j) in enumerate(pairs):
        si = grid_sample_2d_packed(pack_image_corners(aug0[k:k + 1]),
                                   xy[i:i + 1], align_corners=True,
                                   padding_mode="border")[0]
        sj = grid_sample_2d_packed(pack_image_corners(aug1[k:k + 1]),
                                   xy[j:j + 1], align_corners=True,
                                   padding_mode="border")[0]
        gi = si.reshape(*si.shape[:-1], 8, c // 8)
        gj = sj.reshape(*sj.shape[:-1], 8, c // 8)
        dot = jnp.sum(gi * gj, -1)
        ni = jnp.sqrt(jnp.sum(gi * gi, -1))
        nj = jnp.sqrt(jnp.sum(gj * gj, -1))
        cos_all.append(dot / jnp.maximum(ni * nj, 1e-8))
    ref = jnp.mean(jnp.stack(cos_all), axis=0)
    np.testing.assert_allclose(np.asarray(sim), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # quirk mode (reference-shipped default): view j samples the view-i map
    sim_q, _, _ = query_similarity(pts, scene.source_poses, aug0, aug1, nv,
                                   pair_quirk=True)
    cos_all_q = []
    for k, (i, j) in enumerate(pairs):
        si = grid_sample_2d_packed(pack_image_corners(aug0[k:k + 1]),
                                   xy[i:i + 1], align_corners=True,
                                   padding_mode="border")[0]
        sj = grid_sample_2d_packed(pack_image_corners(aug0[k:k + 1]),
                                   xy[j:j + 1], align_corners=True,
                                   padding_mode="border")[0]
        gi = si.reshape(*si.shape[:-1], 8, c // 8)
        gj = sj.reshape(*sj.shape[:-1], 8, c // 8)
        dot = jnp.sum(gi * gj, -1)
        ni = jnp.sqrt(jnp.sum(gi * gi, -1))
        nj = jnp.sqrt(jnp.sum(gj * gj, -1))
        cos_all_q.append(dot / jnp.maximum(ni * nj, 1e-8))
    ref_q = jnp.mean(jnp.stack(cos_all_q), axis=0)
    np.testing.assert_allclose(np.asarray(sim_q), np.asarray(ref_q),
                               rtol=1e-5, atol=1e-5)
