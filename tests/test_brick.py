"""Tile-local brick volume sampling: bit-equality, coverage, and plumbing.

The brick sampler (ops/brick_gather.py) + host planner (ops/brick_plan.py)
replace the render path's scattered correlation-volume gathers (reference
model.py:350-390) with per-(ray-tile x along-ray-segment) bulk slices —
measured 2.2-2.5x faster on chip (script/bench_tile_gather.py) and required
to be bit-identical to grid_sample_3d_packed on every tile the planner
certifies (uncertified tiles route through the flat path via lax.cond).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.ops.brick_gather import (brick_sample_3d_packed,
                                           build_bricks, brick_lookup,
                                           ray_segments)
from uforecon_tpu.ops.brick_plan import (BrickPlan, plan_volume_bricks,
                                         tile_order)
from uforecon_tpu.ops.camera import project_points_ndc
from uforecon_tpu.ops.grid_sample import (grid_sample_3d_packed,
                                          pack_volume_corners)

from helpers import make_synthetic_scene

N_SEG = 8


def _tile_scene(h=64, w=64, n_views=3, tile=16, sn=8, seed=0):
    """Synthetic scene + tile-major sample points + packed stage volumes."""
    scene, extras = make_synthetic_scene(n_views=n_views, h=h, w=w, seed=seed)
    rng = np.random.default_rng(seed + 1)

    perm, inv = tile_order(h, w, tile)
    ray_d = np.asarray(extras["ray_d"])[perm]
    near_r = np.full(h * w, float(scene.near))
    far_r = np.full(h * w, float(scene.far))

    # one tile's rays x z samples: half uniform (coarse-like), half random
    # in [near, far] (importance-like; exercises cross-segment assignment)
    rays = ray_d[: tile * tile]
    nr = near_r[: tile * tile, None]
    fr = far_r[: tile * tile, None]
    t_uni = nr + (fr - nr) * (np.arange(sn // 2) + 0.5)[None] / (sn // 2)
    t_rnd = nr + (fr - nr) * rng.random((tile * tile, sn - sn // 2))
    t = np.sort(np.concatenate([t_uni, t_rnd], axis=1), axis=1)
    pts = np.asarray(scene.ray_o)[None, None] + rays[:, None] * t[..., None]
    seg = ray_segments(jnp.asarray(t, jnp.float32),
                       jnp.asarray(nr[:, 0], jnp.float32),
                       jnp.asarray(fr[:, 0], jnp.float32), N_SEG)

    stage_shapes = {"stage1": (12, h // 4, w // 4),
                    "stage2": (8, h // 2, w // 2),
                    "stage3": (4, h, w)}
    volumes = {
        k: jnp.asarray(pack_volume_corners(
            rng.normal(size=(n_views, D, hs, ws, 2)).astype(np.float32)))
        for k, (D, hs, ws) in stage_shapes.items()
    }
    extras2 = dict(extras,
                   ray_d_img=np.asarray(extras["ray_d"]).reshape(h, w, 3),
                   near_img=near_r.reshape(h, w),
                   far_img=far_r.reshape(h, w))
    return scene, jnp.asarray(pts, jnp.float32), seg, volumes, stage_shapes, \
        extras2


def _plan(scene, ex, tile, stage_shapes, **kw):
    return plan_volume_bricks(
        np.asarray(scene.source_poses), float(scene.near), float(scene.far),
        np.asarray(scene.ray_o), ex["ray_d_img"], ex["near_img"],
        ex["far_img"], tile, stage_shapes, n_seg=N_SEG, **kw)


def test_brick_sampler_bit_equal_with_planned_dims():
    tile = 16
    scene, pts, seg, volumes, stage_shapes, ex = _tile_scene(tile=tile)
    plan = _plan(scene, ex, tile, stage_shapes)
    assert plan is not None

    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    for stage, packed in volumes.items():
        assert plan.flags[stage][0], stage   # tile 0 certified
        ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                    padding_mode="zeros")
        got, viol = brick_sample_3d_packed(
            packed, xyz, seg, plan.dims[stage],
            jnp.asarray(plan.origins[stage][:1]), n_seg=N_SEG,
            align_corners=True, padding_mode="zeros",
            return_violations=True)
        assert int(viol) == 0, stage
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=stage)


def test_brick_sampler_partially_out_of_view():
    """A view whose frustum misses part of the tile: zero-weight points must
    not drag the brick origin (values still bit-equal, violations 0)."""
    tile = 16
    scene, pts, seg, volumes, stage_shapes, ex = _tile_scene(tile=tile, seed=3)
    # shift view 2's projection so many points land outside [-1, 1]
    poses = np.asarray(scene.source_poses).copy()
    poses[2, 0, 3] += 0.9 * poses[2, 2, 3]  # shear x by ~0.9 NDC units
    poses_j = jnp.asarray(poses)

    plan = plan_volume_bricks(
        poses, float(scene.near), float(scene.far),
        np.asarray(scene.ray_o), ex["ray_d_img"], ex["near_img"],
        ex["far_img"], tile, stage_shapes, n_seg=N_SEG)
    assert plan is not None

    _, xyz, _ = project_points_ndc(poses_j, pts,
                                   near_far=(scene.near, scene.far))
    # ensure the perturbation actually pushes points out of view 2
    assert float(jnp.mean((jnp.abs(xyz[2, ..., 0]) > 1.0))) > 0.1
    for stage, packed in volumes.items():
        if not plan.flags[stage][0]:
            continue
        ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                    padding_mode="zeros")
        got, viol = brick_sample_3d_packed(
            packed, xyz, seg, plan.dims[stage],
            jnp.asarray(plan.origins[stage][:1]), n_seg=N_SEG,
            return_violations=True)
        assert int(viol) == 0, stage
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=stage)


def test_brick_sampler_undersized_dims_is_safe():
    """Deliberately undersized bricks: violations reported, output finite
    (local indices clamp — degraded values, never out-of-buffer reads)."""
    scene, pts, seg, volumes, _, _ = _tile_scene(tile=16)
    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    packed = volumes["stage2"]
    origins = jnp.zeros((1, N_SEG, 3, 3), jnp.int32)
    got, viol = brick_sample_3d_packed(packed, xyz, seg, (1, 2, 2), origins,
                                       n_seg=N_SEG,
                                       return_violations=True)
    assert int(viol) > 0
    assert bool(jnp.all(jnp.isfinite(got)))


def test_brick_multi_tile_grouping():
    """n_tiles > 1: each contiguous group gets its own bricks; values equal
    the flat sampler on a 4-tile chunk."""
    tile = 8
    h = w = 32
    scene, extras = make_synthetic_scene(n_views=2, h=h, w=w, seed=5)
    rng = np.random.default_rng(9)
    perm, _ = tile_order(h, w, tile)
    ray_d = np.asarray(extras["ray_d"])[perm][: 4 * tile * tile]
    nr = np.full(ray_d.shape[0], float(scene.near), np.float32)
    fr = np.full(ray_d.shape[0], float(scene.far), np.float32)
    t = nr[:, None] + (fr - nr)[:, None] * rng.random((ray_d.shape[0], 6))
    pts = jnp.asarray(
        np.asarray(scene.ray_o)[None, None] + ray_d[:, None] * t[..., None],
        jnp.float32)
    seg = ray_segments(jnp.asarray(t, jnp.float32), jnp.asarray(nr),
                       jnp.asarray(fr), N_SEG)
    D, hs, ws = 8, h // 2, w // 2
    packed = jnp.asarray(pack_volume_corners(
        rng.normal(size=(2, D, hs, ws, 1)).astype(np.float32)))
    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                padding_mode="zeros")
    plan = plan_volume_bricks(
        np.asarray(scene.source_poses), float(scene.near), float(scene.far),
        np.asarray(scene.ray_o),
        np.asarray(extras["ray_d"]).reshape(h, w, 3),
        np.full((h, w), float(scene.near)), np.full((h, w), float(scene.far)),
        tile, {"s": (D, hs, ws)}, n_seg=N_SEG)
    got, viol = brick_sample_3d_packed(packed, xyz, seg, plan.dims["s"],
                                       jnp.asarray(plan.origins["s"][:4]),
                                       n_seg=N_SEG,
                                       return_violations=True)
    assert int(viol) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_coarse_blocks_bit_equal():
    """The production coarse-pass sampler (static sample-index blocks, no
    per-point segment machinery) is bit-equal to the flat sampler on the
    PRODUCTION sample distribution: points generated by sample_coarse itself
    (linspace +-half-interval jitter — whose support overhangs the nominal
    slab boundaries and near/far by 0.5/(SN-1)) over several seeds, plus a
    deterministic worst case pinning every sample to the extreme ends of its
    jitter support."""
    from uforecon_tpu.ops.brick_gather import brick_sample_coarse_packed
    from uforecon_tpu.ops.sampling import sample_coarse

    tile = 16
    scene, _, _, volumes, stage_shapes, ex = _tile_scene(tile=tile)
    sn = 16
    nr = float(scene.near)
    fr = float(scene.far)
    rays = np.asarray(ex["ray_d"]).reshape(-1, 3)
    perm, _ = tile_order(*ex["hw"], tile)
    rays = rays[perm][: tile * tile]
    rn = rays.shape[0]
    ray_o = jnp.broadcast_to(jnp.asarray(scene.ray_o), (rn, 3))
    near_r = jnp.full((rn,), nr, jnp.float32)
    far_r = jnp.full((rn,), fr, jnp.float32)

    point_sets = [
        sample_coarse(jax.random.PRNGKey(s), ray_o, jnp.asarray(rays), sn,
                      near=near_r, far=far_r)[0]
        for s in range(4)
    ]
    # worst-case jitter: every sample at +0.5 (rays' first half) or -0.5
    # (second half) of its support — exactly the boundary overhang the
    # planner's widened surfaces must cover
    base = np.linspace(0.0, 1.0, sn, dtype=np.float32)
    half = 0.5 / (sn - 1)
    t_hi = nr + (fr - nr) * np.minimum(base + half, base + half)
    t_lo = nr + (fr - nr) * (base - half)
    t_ext = np.where(np.arange(rn)[:, None] < rn // 2, t_hi[None], t_lo[None])
    point_sets.append(jnp.asarray(
        np.asarray(scene.ray_o)[None, None]
        + rays[:, None] * t_ext[..., None], jnp.float32))

    plan = _plan(scene, ex, tile, stage_shapes, point_num=sn)
    for pts in point_sets:
        _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                       near_far=(scene.near, scene.far))
        for stage, packed in volumes.items():
            if not plan.flags[stage][0]:
                continue
            ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                        padding_mode="zeros")
            got, viol = brick_sample_coarse_packed(
                packed, xyz, plan.dims[stage],
                jnp.asarray(plan.origins[stage][:1]), n_seg=N_SEG,
                return_violations=True)
            assert int(viol) == 0, stage
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                          err_msg=stage)


def test_coarse_mxu_matches_flat():
    """The gather-free MXU sampler (2-hot weight contractions against the
    brick) matches the flat packed sampler to float association order
    (~1e-7 f32 on CPU) with zero violations on certified tiles."""
    from uforecon_tpu.ops.brick_gather import brick_sample_coarse_mxu

    tile = 16
    scene, _, _, volumes, stage_shapes, ex = _tile_scene(tile=tile)
    rng = np.random.default_rng(33)
    sn = 16
    nr = float(scene.near)
    fr = float(scene.far)
    rays = np.asarray(ex["ray_d"]).reshape(-1, 3)
    perm, _ = tile_order(*ex["hw"], tile)
    rays = rays[perm][: tile * tile]
    u = rng.random((rays.shape[0], sn))
    t = nr + (fr - nr) * (np.arange(sn)[None] + u) / sn
    pts = jnp.asarray(np.asarray(scene.ray_o)[None, None]
                      + rays[:, None] * t[..., None], jnp.float32)
    plan = _plan(scene, ex, tile, stage_shapes)
    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    for stage, packed in volumes.items():
        if not plan.flags[stage][0]:
            continue
        ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                    padding_mode="zeros")
        got, viol = brick_sample_coarse_mxu(
            packed, xyz, plan.dims[stage],
            jnp.asarray(plan.origins[stage][:1]), n_seg=N_SEG,
            return_violations=True)
        assert int(viol) == 0, stage
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6, err_msg=stage)


def test_lane_padded_pack_bit_equal():
    """corner_pad=16 (128-lane rows, the OOM-avoiding layout) + c_out=9
    must reproduce the unpadded samplers bit-for-bit, flat and brick."""
    tile = 16
    scene, pts, seg, _, stage_shapes, ex = _tile_scene(tile=tile)
    rng = np.random.default_rng(11)
    D, hs, ws = stage_shapes["stage2"]
    vol = rng.normal(size=(3, D, hs, ws, 9)).astype(np.float32)
    plain = jnp.asarray(pack_volume_corners(jnp.asarray(vol)))
    padded = jnp.asarray(pack_volume_corners(jnp.asarray(vol), corner_pad=16))
    assert padded.shape[-1] == 128

    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    ref = grid_sample_3d_packed(plain, xyz, align_corners=True,
                                padding_mode="zeros")
    flat = grid_sample_3d_packed(padded, xyz, align_corners=True,
                                 padding_mode="zeros", c_out=9)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(ref))

    plan = _plan(scene, ex, tile, {"stage2": stage_shapes["stage2"]})
    got, viol = brick_sample_3d_packed(
        padded, xyz, seg, plan.dims["stage2"],
        jnp.asarray(plan.origins["stage2"][:1]), n_seg=N_SEG,
        return_violations=True, c_out=9)
    assert int(viol) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_plan_flags_uncertified_tiles():
    """A view whose depth crosses zero inside cells (camera close to the
    sampled region, near below the slab margin) must leave those tiles
    uncertified — flags False or plan None, never silent wrong dims."""
    from uforecon_tpu.ops import camera as cam_ops

    from helpers import look_at

    tile = 16
    scene, _, _, _, _, ex = _tile_scene(tile=tile)
    h, w = ex["hw"]
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = np.asarray(ex["intrinsics"])
    norm = cam_ops.ndc_normalize_matrix(w, h)
    poses = np.asarray(scene.source_poses).copy()
    # a view near the origin looking BACK along -z: depth decreases along
    # cam0's rays and crosses zero inside the sampled t range
    poses[1] = norm @ K4 @ look_at([0.0, 0.02, 0.01], target=[0.0, 0.0, -1.0])
    near, far = 0.5, 6.0
    plan = plan_volume_bricks(
        poses, near, far, np.asarray(scene.ray_o), ex["ray_d_img"],
        np.full((h, w), near), np.full((h, w), far),
        tile, {"stage3": (4, h, w)}, n_seg=N_SEG)
    if plan is not None:
        assert not plan.flags["stage3"].any()


@pytest.mark.slow  # two full render_rays compiles (~120 s cold CPU); the
# model-level cond plumbing is covered fast by
# test_render_chunk_brick_matches_flat, and bench.py exercises this path
# on chip every round
def test_renderer_brick_plan_end_to_end():
    """SceneRenderer.render_rays with a BrickPlan: per-chunk flag
    partitioning + tile-major ordering reproduce the flat render."""
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon
    from uforecon_tpu.pipeline.renderer import SceneRenderer

    tile = 8
    h = w = 32
    cfg = Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                 coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                 test_sample_fine=8, volume_type="correlation",
                 extract_geometry=True, brick_tile=tile, brick_n_seg=N_SEG,
                 volume_merge="never")  # bricks certify per-stage volumes
    scene, extras = make_synthetic_scene(n_views=2, h=h, w=w, ndepth=16)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    rays0 = jnp.asarray(np.asarray(extras["ray_d"])[:8])
    variables = jax.jit(model.init)(key, scene, rays0, key)

    renderer = SceneRenderer(cfg, variables, chunk=tile * tile)
    enc = renderer.encode(scene)
    stage_shapes = {k: tuple(v.shape[1:4]) for k, v in enc.volumes.items()}
    plan = plan_volume_bricks(
        np.asarray(scene.source_poses), float(scene.near), float(scene.far),
        np.asarray(scene.ray_o),
        np.asarray(extras["ray_d"]).reshape(h, w, 3),
        np.full((h, w), float(scene.near), np.float64),
        np.full((h, w), float(scene.far), np.float64),
        tile, stage_shapes, n_seg=N_SEG)
    assert plan is not None and isinstance(plan, BrickPlan)

    perm, inv = tile_order(h, w, tile)
    ray_d = np.asarray(extras["ray_d"])
    near = np.full(h * w, float(scene.near), np.float32)
    far = np.full(h * w, float(scene.far), np.float32)
    kr = jax.random.PRNGKey(3)
    tiled = renderer.render_rays(scene, enc, ray_d[perm], near[perm],
                                 far[perm], kr, volume_brick=plan)
    # compare the brick render against the flat render OF THE SAME RAY
    # ORDERING (the per-chunk RNG stream follows chunk contents)
    tiled_flat = renderer.render_rays(scene, enc, ray_d[perm], near[perm],
                                      far[perm], kr)
    for k in ("depth", "rgb"):
        np.testing.assert_allclose(tiled[k], tiled_flat[k], rtol=2e-6,
                                   atol=2e-6, err_msg=k)


@pytest.mark.slow
def test_render_chunk_brick_matches_flat():
    """End-to-end plumbing: render_chunk with volume_brick + flags produces
    the same depth/rgb as the flat path on a tile-coherent chunk, for both
    flag settings (True = brick branch, False = flat branch of lax.cond).

    slow: three full render_chunk compiles (~2 min on the 1-core CPU host)
    guarding machinery that is non-default since round 4 (volume_brick
    defaults to 'never', BASELINE.md round-4 A/B)."""
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    tile = 8
    h = w = 32
    cfg = Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                 coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                 test_sample_fine=8, volume_type="correlation",
                 brick_tile=tile, brick_n_seg=N_SEG)
    scene, extras = make_synthetic_scene(n_views=2, h=h, w=w, ndepth=16)
    perm, _ = tile_order(h, w, tile)
    ray_d = jnp.asarray(np.asarray(extras["ray_d"])[perm][: tile * tile])

    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, scene, ray_d[:8], key)
    enc = model.apply(variables, scene, method=model.encode)

    stage_shapes = {k: tuple(v.shape[1:4]) for k, v in enc.volumes.items()}
    plan = plan_volume_bricks(
        np.asarray(scene.source_poses), float(scene.near), float(scene.far),
        np.asarray(scene.ray_o),
        np.asarray(extras["ray_d"]).reshape(h, w, 3),
        np.full((h, w), float(scene.near), np.float64),
        np.full((h, w), float(scene.far), np.float64),
        tile, stage_shapes, n_seg=N_SEG)
    assert plan is not None
    assert all(f[0] for f in plan.flags.values())

    kr = jax.random.PRNGKey(7)
    flat = model.apply(variables, scene, enc, ray_d, kr,
                       method=model.render_chunk)

    origins = {s: jnp.asarray(plan.origins[s][:1]) for s in plan.origins}

    def run(flag):
        flags = {s: jnp.asarray(flag) for s in plan.dims}
        return model.apply(variables, scene, enc, ray_d, kr,
                           volume_brick=plan.dims, brick_origins=origins,
                           brick_flags=flags,
                           method=model.render_chunk)

    on, off = run(True), run(False)
    for k in ("depth", "rgb", "opacity"):
        # within one program, the lax.cond branches must agree BITWISE
        # (the sampler itself is bit-equal; unit tests above)
        np.testing.assert_array_equal(
            np.asarray(on["fine"][k]), np.asarray(off["fine"][k]),
            err_msg=f"{k} brick-vs-flat branch")
        # across programs (cond vs no cond), only XLA fusion noise remains
        np.testing.assert_allclose(
            np.asarray(on["fine"][k]), np.asarray(flat["fine"][k]),
            rtol=2e-6, atol=2e-6, err_msg=f"{k} vs plain program")
