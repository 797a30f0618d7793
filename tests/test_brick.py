"""Tile-local brick volume sampling: bit-equality, coverage, and plumbing.

The brick sampler (ops/brick_gather.py) + host planner (ops/brick_plan.py)
replace the render path's scattered correlation-volume gathers (reference
model.py:350-390) with per-(ray-tile x z-segment) bulk slices — measured
2.2-2.5x faster on chip (script/bench_tile_gather.py) and required to be
bit-identical to grid_sample_3d_packed whenever the planner certifies dims.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.ops.brick_gather import brick_sample_3d_packed
from uforecon_tpu.ops.brick_plan import plan_volume_bricks, tile_order
from uforecon_tpu.ops.camera import project_points_ndc
from uforecon_tpu.ops.grid_sample import (grid_sample_3d_packed,
                                          pack_volume_corners)

from helpers import make_synthetic_scene


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

    stage_shapes = {"stage1": (12, h // 4, w // 4),
                    "stage2": (8, h // 2, w // 2),
                    "stage3": (4, h, w)}
    volumes = {
        k: jnp.asarray(pack_volume_corners(
            rng.normal(size=(n_views, D, hs, ws, 2)).astype(np.float32)))
        for k, (D, hs, ws) in stage_shapes.items()
    }
    extras2 = dict(extras, ray_d_img=np.asarray(extras["ray_d"]).reshape(h, w, 3),
                   near_img=near_r[inv].reshape(h, w),
                   far_img=far_r[inv].reshape(h, w))
    return scene, jnp.asarray(pts, jnp.float32), volumes, stage_shapes, extras2


def test_brick_sampler_bit_equal_with_planned_dims():
    tile = 16
    scene, pts, volumes, stage_shapes, ex = _tile_scene(tile=tile)
    plan = plan_volume_bricks(
        np.asarray(scene.source_poses), float(scene.near), float(scene.far),
        np.asarray(scene.ray_o), ex["ray_d_img"], ex["near_img"],
        ex["far_img"], tile, stage_shapes, n_seg=4)
    assert plan is not None

    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    for stage, packed in volumes.items():
        ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                    padding_mode="zeros")
        got, viol = brick_sample_3d_packed(
            packed, xyz, plan[stage], n_seg=4, n_tiles=1,
            align_corners=True, padding_mode="zeros",
            return_violations=True)
        assert int(viol) == 0, stage
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=stage)


def test_brick_sampler_partially_out_of_view():
    """A view whose frustum misses part of the tile: zero-weight points must
    not drag the brick origin (values still bit-equal, violations 0)."""
    tile = 16
    scene, pts, volumes, stage_shapes, ex = _tile_scene(tile=tile, seed=3)
    # shift view 2's projection so many points land outside [-1, 1]
    poses = np.asarray(scene.source_poses).copy()
    poses[2, 0, 3] += 0.9 * poses[2, 2, 3]  # shear x by ~0.9 NDC units
    poses_j = jnp.asarray(poses)

    plan = plan_volume_bricks(
        poses, float(scene.near), float(scene.far),
        np.asarray(scene.ray_o), ex["ray_d_img"], ex["near_img"],
        ex["far_img"], tile, stage_shapes, n_seg=4)
    assert plan is not None

    _, xyz, _ = project_points_ndc(poses_j, pts,
                                   near_far=(scene.near, scene.far))
    # ensure the perturbation actually pushes points out of view 2
    assert float(jnp.mean((jnp.abs(xyz[2, ..., 0]) > 1.0))) > 0.1
    for stage, packed in volumes.items():
        ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                    padding_mode="zeros")
        got, viol = brick_sample_3d_packed(
            packed, xyz, plan[stage], n_seg=4, n_tiles=1,
            return_violations=True)
        assert int(viol) == 0, stage
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=stage)


def test_brick_sampler_undersized_dims_is_safe():
    """Deliberately undersized bricks: violations reported, output finite
    (local indices clamp — degraded values, never out-of-buffer reads)."""
    scene, pts, volumes, _, _ = _tile_scene(tile=16)
    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    packed = volumes["stage2"]
    got, viol = brick_sample_3d_packed(packed, xyz, (2, 2), n_seg=4,
                                       n_tiles=1, return_violations=True)
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
    t = float(scene.near) + (float(scene.far) - float(scene.near)) * \
        rng.random((ray_d.shape[0], 6))
    pts = jnp.asarray(
        np.asarray(scene.ray_o)[None, None] + ray_d[:, None] * t[..., None],
        jnp.float32)
    D, hs, ws = 8, h // 2, w // 2
    packed = jnp.asarray(pack_volume_corners(
        rng.normal(size=(2, D, hs, ws, 1)).astype(np.float32)))
    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    ref = grid_sample_3d_packed(packed, xyz, align_corners=True,
                                padding_mode="zeros")
    got, viol = brick_sample_3d_packed(packed, xyz, (hs, ws), n_seg=2,
                                       n_tiles=4, return_violations=True)
    assert int(viol) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_lane_padded_pack_bit_equal():
    """corner_pad=16 (128-lane rows, the OOM-avoiding layout) + c_out=9
    must reproduce the unpadded samplers bit-for-bit, flat and brick."""
    tile = 16
    scene, pts, _, stage_shapes, ex = _tile_scene(tile=tile)
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

    plan = plan_volume_bricks(
        np.asarray(scene.source_poses), float(scene.near), float(scene.far),
        np.asarray(scene.ray_o), ex["ray_d_img"], ex["near_img"],
        ex["far_img"], tile, {"stage2": stage_shapes["stage2"]}, n_seg=4)
    got, viol = brick_sample_3d_packed(
        padded, xyz, plan["stage2"], n_seg=4, n_tiles=1,
        return_violations=True, c_out=9)
    assert int(viol) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_plan_rejects_nonpositive_depth_candidates():
    """The hull certificate fails only when the one-voxel-extended vz slab
    reaches nonpositive projective depth (near < voxel margin) AND a view's
    depth actually crosses zero inside a cell — then the planner must return
    None (renderer falls back to flat gathers). Views where every point is
    zero-weight (looking away etc.) are soundly certified instead: their
    slab intervals come back empty.
    """
    from uforecon_tpu.ops import camera as cam_ops

    from helpers import look_at

    tile = 16
    scene, _, _, _, ex = _tile_scene(tile=tile)
    h, w = ex["hw"]
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = np.asarray(ex["intrinsics"])
    norm = cam_ops.ndc_normalize_matrix(w, h)
    poses = np.asarray(scene.source_poses).copy()
    # a view near the origin looking BACK along -z: depth decreases along
    # cam0's rays and crosses zero inside [t_near, t_far]
    poses[1] = norm @ K4 @ look_at([0.0, 0.02, 0.01], target=[0.0, 0.0, -1.0])
    # near below the one-voxel depth margin: 0.5 - (6-0.5)/(4-1) < 0
    near, far = 0.5, 6.0
    plan = plan_volume_bricks(
        poses, near, far, np.asarray(scene.ray_o), ex["ray_d_img"],
        np.full((h, w), near), np.full((h, w), far),
        tile, {"stage3": (4, h, w)}, n_seg=4)
    assert plan is None


def test_render_chunk_brick_matches_flat():
    """End-to-end plumbing: render_chunk with volume_brick produces the
    same depth/rgb as the flat path on a tile-coherent chunk."""
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    tile = 8
    h = w = 32
    cfg = Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                 coarse_sample=8, fine_sample=8, test_sample_coarse=8,
                 test_sample_fine=8, volume_type="correlation",
                 brick_tile=tile, brick_n_seg=2)
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
        tile, stage_shapes, n_seg=cfg.brick_n_seg)
    assert plan is not None

    kr = jax.random.PRNGKey(7)
    flat = model.apply(variables, scene, enc, ray_d, kr,
                       method=model.render_chunk)
    brick = model.apply(variables, scene, enc, ray_d, kr,
                        volume_brick=plan, method=model.render_chunk)
    for k in ("depth", "rgb", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(flat["fine"][k]), np.asarray(brick["fine"][k]),
            err_msg=k)
