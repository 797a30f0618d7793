"""Time one full training step (5-view DTU train workload) on the chip.

Prints two JSON lines: compile+first-step time, then steady-state
step time (min of 5). The train step is encoder-bound (see BASELINE.md:
cascade homography-warp gathers + 3D U-Net convolutions); the render-side
fused kernels contribute via their reference-VJP backward.

Usage: python script/bench_train.py [--dtype bfloat16] [--views 5]
Keep ONE process on the chip (axon tunnel).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--encoder_dtype", default="",
                    help="matcher-only dtype override (mixed policy: "
                         "bfloat16 matcher / float32 render head)")
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.pipeline.trainer import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

    from uforecon_tpu.config import perf_env_overrides
    cfg = Config(compute_dtype=args.dtype, encoder_dtype=args.encoder_dtype,
                 **perf_env_overrides())
    scene, ray_d = _tiny_scene(n_views=args.views, h=args.h, w=args.w,
                               ndepth=192)
    from uforecon_tpu.models.uforecon import UFORecon

    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, scene, ray_d[:64], key)

    state = create_train_state(cfg, variables)
    tx = make_optimizer(cfg)
    train_step = make_train_step(cfg, model, tx)

    rn = cfg.train_ray_num
    rays = ray_d[:rn]
    rgb_gt = jnp.zeros((rn, 3))
    depth_gt = jnp.full((rn,), float(scene.near) + 0.5)

    t0 = time.perf_counter()
    state, logs = train_step(state, scene, rays, rgb_gt, depth_gt, key)
    print(json.dumps({
        "compile_and_first_step_s": round(time.perf_counter() - t0, 1),
        "loss": float(logs["train/loss_all"]),
    }), flush=True)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, logs = train_step(state, scene, rays, rgb_gt, depth_gt,
                                 jax.random.PRNGKey(i))
        _ = float(logs["train/loss_all"])  # scalar fetch = reliable sync
        times.append(time.perf_counter() - t0)
    print(json.dumps({"step_s": round(min(times), 3),
                      "dtype": args.dtype,
                      "encoder_dtype": args.encoder_dtype or args.dtype,
                      "steps_per_sec": round(1 / min(times), 3)}))


if __name__ == "__main__":
    main()
