"""On-chip A/B of the production volume query: flat vs brick, per stage.

Times query-level flat gathers vs brick_sample_3d_packed with REAL planner
dims on the bench scene (800x640, chunk 1024, 64 samples), sweeping tile
size and segment count, with a breakdown (slice-only / origins-only) to
attribute brick overhead. Decides the shipped (brick_tile, brick_n_seg)
defaults and the planner's row budget.

Usage: python script/bench_brick_query.py [tile] [n_seg]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _tiny_scene
    from uforecon_tpu.ops.brick_gather import (brick_sample_3d_packed,
                                               ray_segments)
    from uforecon_tpu.ops.brick_plan import plan_volume_bricks, tile_order
    from uforecon_tpu.ops.camera import project_points_ndc
    from uforecon_tpu.ops.grid_sample import grid_sample_3d_packed

    h, w = 640, 800
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_seg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene, ray_d = _tiny_scene(n_views=3, h=h, w=w, ndepth=192)
    near_s, far_s = float(scene.near), float(scene.far)
    near = np.full(h * w, near_s, np.float32)
    far = np.full(h * w, far_s, np.float32)
    stage_shapes = {"stage1": (48, 160, 200), "stage2": (32, 320, 400),
                    "stage3": (8, 640, 800)}
    plan = plan_volume_bricks(np.asarray(scene.source_poses), near_s, far_s,
                              np.asarray(scene.ray_o),
                              np.asarray(ray_d).reshape(h, w, 3),
                              near.reshape(h, w), far.reshape(h, w),
                              tile, stage_shapes, n_seg=n_seg,
                              row_budget=1 << 30)

    perm, _ = tile_order(h, w, tile)
    chunk = 1024
    n_tiles = chunk // (tile * tile)
    rd = np.asarray(ray_d)[perm][:chunk]
    SN = 64
    rng = np.random.default_rng(0)
    if os.environ.get("BENCH_SAMPLER", "coarse") == "coarse":
        # stratified (the production coarse pass): sample i inside stratum i
        t = near_s + (far_s - near_s) * \
            (np.arange(SN)[None] + rng.random((chunk, SN))) / SN
    else:
        t = near_s + (far_s - near_s) * np.sort(rng.random((chunk, SN)),
                                                axis=1)
    pts = jnp.asarray(np.asarray(scene.ray_o)[None, None]
                      + rd[:, None] * t[..., None], jnp.float32)
    seg = ray_segments(jnp.asarray(t, jnp.float32),
                       jnp.asarray(np.full(chunk, near_s), jnp.float32),
                       jnp.asarray(np.full(chunk, far_s), jnp.float32),
                       n_seg)
    _, xyz, _ = project_points_ndc(scene.source_poses, pts,
                                   near_far=(scene.near, scene.far))
    xyz = jax.block_until_ready(jax.device_put(xyz))

    # the axon tunnel adds ~20 ms dispatch latency per call: amortize by
    # looping the op K times INSIDE one jitted program (perturbed grid per
    # iteration so XLA cannot CSE the loop body)
    K = 16

    def timeit(f, *a, n=6):
        jax.block_until_ready(f(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    eps = jnp.linspace(0.0, 1e-4, K)

    for s, (D, hs, ws) in stage_shapes.items():
        vol = jnp.asarray(rng.normal(size=(3, D, hs, ws, 128)).astype(
            np.float32), jnp.bfloat16)

        @jax.jit
        def flat(v, g):
            def one(e):
                return grid_sample_3d_packed(
                    v, g + e, align_corners=True, padding_mode="zeros",
                    c_out=9).sum()
            return jax.lax.map(one, eps)

        tf_ = timeit(flat, vol, xyz)

        org = jnp.asarray(plan.origins[s][:n_tiles])

        if os.environ.get("BENCH_SAMPLER", "coarse") == "coarse":
            from uforecon_tpu.ops.brick_gather import \
                brick_sample_coarse_packed

            @jax.jit
            def brick(v, g, sg, o, d=plan.dims[s]):
                def one(e):
                    return brick_sample_coarse_packed(
                        v, g + e, d, o, n_seg=n_seg,
                        align_corners=True, padding_mode="zeros",
                        c_out=9).sum()
                return jax.lax.map(one, eps)
        else:
            @jax.jit
            def brick(v, g, sg, o, d=plan.dims[s]):
                def one(e):
                    return brick_sample_3d_packed(
                        v, g + e, sg, d, o, n_seg=n_seg,
                        align_corners=True, padding_mode="zeros",
                        c_out=9).sum()
                return jax.lax.map(one, eps)

        tb = timeit(brick, vol, xyz, seg, org)
        rows = chunk * SN * 3
        print(json.dumps({
            "stage": s, "tile": tile, "n_seg": n_seg,
            "rows_per_tile": sum(a * b * c for a, b, c in plan.dims[s]),
            "cov": round(float(plan.flags[s].mean()), 3),
            "flat_ms": round(tf_ * 1e3, 3), "brick_ms": round(tb * 1e3, 3),
            "flat_ns_row": round(tf_ / rows * 1e9, 2),
            "brick_ns_row": round(tb / rows * 1e9, 2),
            "speedup": round(tf_ / tb, 2)}), flush=True)


if __name__ == "__main__":
    main()
