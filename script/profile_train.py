"""Profile one full training step on the TPU chip and print the op-time
breakdown by HLO category plus the top ops.

Usage: python script/profile_train.py [--dtype float32] [--views 5]
Same workload as script/bench_train.py (5-view 512x640 DTU train shapes,
frozen matcher, 1024-ray render chunk). The step is encoder-bound
(BASELINE.md): this tool attributes the time so the optimization targets
the measured bucket, not the assumed one. Keep ONE process on the chip.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/prof_train")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--encoder_dtype", default="")
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon
    from uforecon_tpu.pipeline.trainer import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

    from uforecon_tpu.config import perf_env_overrides
    cfg = Config(compute_dtype=args.dtype, encoder_dtype=args.encoder_dtype,
                 **perf_env_overrides())
    scene, ray_d = _tiny_scene(n_views=args.views, h=args.h, w=args.w,
                               ndepth=192)
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

    state, logs = train_step(state, scene, rays, rgb_gt, depth_gt, key)
    _ = float(logs["train/loss_all"])
    t0 = time.perf_counter()
    state, logs = train_step(state, scene, rays, rgb_gt, depth_gt, key)
    _ = float(logs["train/loss_all"])
    print(json.dumps({"step_s": round(time.perf_counter() - t0, 3),
                      "dtype": args.dtype,
                      "encoder_dtype": args.encoder_dtype or args.dtype}))

    with jax.profiler.trace(args.out):
        state, logs = train_step(state, scene, rays, rgb_gt, depth_gt, key)
        _ = float(logs["train/loss_all"])

    from profile_render import summarize

    summarize(args.out, top=40)


if __name__ == "__main__":
    main()
