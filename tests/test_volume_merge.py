"""Merged stage-volume path (ops/volume_merge.py, Config.volume_merge).

The merge is the round-5 metric-parity redesign: 3 gather rows/point
instead of 9 (VERDICT r4 #1). These tests pin (a) the resampler's
align-corners semantics, (b) BIT-level agreement with the exact per-stage
path when the common grid equals every stage grid (resampling degenerates
to identity), and (c) closeness on smooth volumes at the real mismatched
stage shapes, where the re-discretization is an approximation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _np_resize_axis_ac(vol, axis, n_out):
    n_in = vol.shape[axis]
    if n_in == n_out:
        return vol
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    i0 = np.clip(np.floor(pos), 0, n_in - 2).astype(int)
    f = pos - i0
    a = np.take(vol, i0, axis=axis)
    b = np.take(vol, i0 + 1, axis=axis)
    shape = [1] * vol.ndim
    shape[axis] = n_out
    f = f.reshape(shape)
    return a * (1 - f) + b * f


def test_resize_axis_identity_and_interp():
    from uforecon_tpu.ops.volume_merge import resize_axis_linear_ac

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((2, 5, 6, 7, 3)).astype(np.float32)
    # same-size resample is the exact identity (bit-equal)
    out = resize_axis_linear_ac(jnp.asarray(vol), 1, 5)
    np.testing.assert_array_equal(np.asarray(out), vol)
    # up/down interp match the numpy align-corners reference
    for axis, n_out in [(1, 9), (2, 3), (3, 13)]:
        out = resize_axis_linear_ac(jnp.asarray(vol), axis, n_out)
        ref = _np_resize_axis_ac(vol, axis, n_out)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def _exact_query(fws_np, xyz):
    """The exact per-stage path math (query_correlation_volume tail) on
    per-stage packed volumes."""
    from uforecon_tpu.ops.grid_sample import (grid_sample_3d_packed,
                                              pack_volume_corners)

    sampled = []
    for stage in sorted(fws_np.keys()):
        packed = pack_volume_corners(jnp.asarray(fws_np[stage]))
        sampled.append(grid_sample_3d_packed(
            packed, xyz, align_corners=True, padding_mode="zeros"))
    feats = jnp.concatenate([fw[..., :-1] for fw in sampled], axis=-1)
    wsum = sum(fw[..., -1:] for fw in sampled)
    g = jnp.sum(feats * wsum, axis=0)
    return g / (jnp.sum(wsum, axis=0) + 1e-8)


def test_merged_equals_exact_when_grids_match():
    """Common grid == every stage grid -> resampling is the identity and
    the merged query must match the exact path to f32 association."""
    from uforecon_tpu.ops.volume_merge import (merge_stage_volumes,
                                               query_merged_volume)

    rng = np.random.default_rng(1)
    nv, d, h, w = 3, 6, 8, 10
    fws = {f"stage{s}": np.abs(
        rng.standard_normal((nv, d, h, w, 9))).astype(np.float32)
        for s in (1, 2, 3)}
    xyz = jnp.asarray(
        rng.uniform(-0.95, 0.95, (nv, 17, 5, 3)).astype(np.float32))

    merged = merge_stage_volumes(fws, d, (h, w), dtype=jnp.float32)
    assert merged.shape == (nv, d, h, w, 8 * 25)
    got = query_merged_volume(merged, xyz, n_feat=24)
    ref = _exact_query(fws, xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_merged_with_corner_pad_matches_unpadded():
    from uforecon_tpu.ops.volume_merge import (merge_stage_volumes,
                                               query_merged_volume)

    rng = np.random.default_rng(2)
    nv, d, h, w = 2, 4, 6, 6
    fws = {f"stage{s}": np.abs(
        rng.standard_normal((nv, d, h, w, 9))).astype(np.float32)
        for s in (1, 2, 3)}
    xyz = jnp.asarray(
        rng.uniform(-0.9, 0.9, (nv, 11, 3, 3)).astype(np.float32))
    plain = query_merged_volume(
        merge_stage_volumes(fws, d, (h, w), dtype=jnp.float32), xyz, 24)
    padded = query_merged_volume(
        merge_stage_volumes(fws, d, (h, w), dtype=jnp.float32,
                            corner_pad=32), xyz, 24)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(padded))


@pytest.mark.slow  # characterization of the re-discretization error
def test_merged_close_on_smooth_volumes_at_real_stage_shapes():
    """At the production shape ratios (z 48/32/8, xy 1/4 / 1/2 / 1/1) the
    merge re-discretizes the coarse stages; on smooth fields — post-U-Net
    features are smooth at their own grid scale — the error must be small
    relative to the signal."""
    from uforecon_tpu.ops.volume_merge import (merge_stage_volumes,
                                               query_merged_volume)

    nv, h, w = 2, 32, 40
    shapes = {"stage1": (12, h // 4, w // 4), "stage2": (8, h // 2, w // 2),
              "stage3": (4, h, w)}

    def field(shape, v, phase):
        d_, h_, w_ = shape
        z, y, x = np.meshgrid(np.linspace(-1, 1, d_), np.linspace(-1, 1, h_),
                              np.linspace(-1, 1, w_), indexing="ij")
        chans = [np.sin(1.5 * x + phase + k) * np.cos(1.2 * y - k)
                 + 0.5 * np.sin(z * 2 + v) for k in range(8)]
        weight = 1.2 + np.sin(x + y + z + v)  # positive
        return np.stack(chans + [weight], -1).astype(np.float32)

    fws = {s: np.stack([field(shp, v, i) for v in range(nv)])
           for i, (s, shp) in enumerate(shapes.items())}
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(
        rng.uniform(-0.9, 0.9, (nv, 64, 7, 3)).astype(np.float32))

    merged = merge_stage_volumes(fws, 4, (h, w), dtype=jnp.float32)
    got = np.asarray(query_merged_volume(merged, xyz, 24))
    ref = np.asarray(_exact_query(fws, xyz))
    # smooth-field re-discretization error: small vs O(1) signal
    err = np.abs(got - ref)
    assert err.mean() < 0.05, err.mean()   # ~3% of the O(1) signal measured
    assert err.max() < 0.3, err.max()


@pytest.mark.slow
@pytest.mark.parametrize("merge", ["never", "auto"])
def test_model_render_with_volume_merge(merge):
    """Model-level: volume_merge='auto' encodes one merged volume and
    renders finite outputs through the same render_chunk contract."""
    from helpers import make_synthetic_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    cfg = Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                 coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                 test_sample_fine=8, volume_type="correlation",
                 extract_geometry=True, volume_merge=merge)
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=32)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    rays = extras["ray_d"][:32]
    variables = jax.jit(model.init)(key, scene, rays, key)
    out = jax.jit(model.apply)(variables, scene, rays, key)
    assert np.all(np.isfinite(np.asarray(out["fine"]["depth"])))
    assert np.all(np.isfinite(np.asarray(out["fine"]["rgb"])))
    if merge == "auto":
        enc = model.bind(variables).encode(scene)
        assert set(enc.volumes.keys()) == {"merged"}
        nv, d_m, hh, ww, c8 = enc.volumes["merged"].shape
        assert (d_m, hh, ww, c8) == (8, 32, 32, 200)


def test_config_rejects_merge_plus_brick():
    from uforecon_tpu.config import Config

    with pytest.raises(ValueError):
        Config(volume_merge="auto", volume_brick="auto")


@pytest.mark.slow
def test_merge_auto_is_eval_only():
    """'auto' must leave the TRAINING path on exact per-stage volumes
    (extract_geometry=False): training through the merged resample was
    measured unstable (BASELINE.md round 5). 'always' forces it."""
    from helpers import make_synthetic_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon
    import jax as _jax

    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=32)
    base = dict(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                test_sample_fine=8, volume_type="correlation",
                volume_merge="auto")
    rays = extras["ray_d"][:32]
    key = _jax.random.PRNGKey(0)

    for extract, merge_mode, expect in [
        (False, "auto", {"stage1", "stage2", "stage3"}),
        (True, "auto", {"merged"}),
        (False, "always", {"merged"}),
    ]:
        cfg = Config(**{**base, "volume_merge": merge_mode,
                        "extract_geometry": extract})
        model = UFORecon(cfg)
        variables = _jax.jit(model.init)(key, scene, rays, key)
        enc = model.bind(variables).encode(scene)
        assert set(enc.volumes.keys()) == expect, (extract, merge_mode)


def test_image_row_merge_sim_bitexact_and_img_convention():
    """The shared image row must leave the similarity features BIT-equal to
    query_similarity (same maps, same row prefix) and sample the image
    features with the pair maps' align_corners=True/border convention."""
    from uforecon_tpu.models.ray_transformer import (
        query_similarity, query_similarity_with_image_row)
    from uforecon_tpu.ops.grid_sample import (grid_sample_2d_packed,
                                              pack_image_corners)
    from uforecon_tpu.ops.camera import project_points_ndc

    rng = np.random.default_rng(5)
    nv, hh, ww, c = 3, 12, 16, 32
    n_pairs = nv * (nv - 1) // 2
    aug0 = jnp.asarray(rng.standard_normal((n_pairs, hh, ww, c)), jnp.float32)
    aug1 = jnp.asarray(rng.standard_normal((n_pairs, hh, ww, c)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((nv, hh, ww, c)), jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * nv))
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (9, 4, 3)).astype(np.float32))

    sim_ref, xy_ref, valid_ref = query_similarity(
        pts, poses, aug0, aug1, nv, fused="never")
    sim, img, xy, valid = query_similarity_with_image_row(
        pts, poses, aug0, aug1, feats, nv, fused="never")
    np.testing.assert_array_equal(np.asarray(sim), np.asarray(sim_ref))
    np.testing.assert_array_equal(np.asarray(xy), np.asarray(xy_ref))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))

    img_ref = grid_sample_2d_packed(pack_image_corners(feats), xy,
                                    align_corners=True,
                                    padding_mode="border")
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_ref))


@pytest.mark.slow
def test_model_render_with_image_row_merge():
    from helpers import make_synthetic_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    cfg = Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                 coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                 test_sample_fine=8, volume_type="correlation",
                 extract_geometry=True, image_row_merge="auto")
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=32)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    rays = extras["ray_d"][:32]
    variables = jax.jit(model.init)(key, scene, rays, key)
    out = jax.jit(model.apply)(variables, scene, rays, key)
    assert np.all(np.isfinite(np.asarray(out["fine"]["depth"])))


@pytest.mark.slow
def test_merge_auto_memory_guard_falls_back_to_exact():
    """'auto' must fall back to the exact per-stage path when the merged
    volume's static size exceeds merge_max_bytes (4-5 views at full eval
    resolution measured OOM on 16 GB v5e)."""
    from helpers import make_synthetic_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon
    import jax as _jax

    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=32)
    base = dict(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                test_sample_fine=8, volume_type="correlation",
                extract_geometry=True, volume_merge="auto")
    key = _jax.random.PRNGKey(0)
    rays = extras["ray_d"][:16]
    # tiny budget -> exact; ample budget -> merged
    for budget, expect in [(1024, {"stage1", "stage2", "stage3"}),
                           (1 << 30, {"merged"})]:
        cfg = Config(**base, merge_max_bytes=budget)
        model = UFORecon(cfg)
        variables = _jax.jit(model.init)(key, scene, rays, key)
        enc = model.bind(variables).encode(scene)
        assert set(enc.volumes.keys()) == expect, budget
