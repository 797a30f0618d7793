"""On-chip microbench: why does the stage-3 cascade warp gather run 4x
slower per row than stages 1-2?

The round-4 train-step profile (script/profile_train.py) shows the
homography-warp gathers (cascade.py _correlate_chunked, reference
fmt/module.py:329-367 semantics) at:

  stage 1: (4, 20480, 128) f32 source (42 MB),  10.8 ns/row
  stage 2: (4, 81920,  64) f32 source (84 MB),  10.8 ns/row
  stage 3: (4, 327680, 32) f32 source (168 MB), 39.2 ns/row   <-- anomaly

Candidate mechanisms this script separates:
  a) row lane-width: 32-lane rows pad to a 128-lane tile per issue, so a
     source lane-padded to 128 should restore the fast rate at 4x bytes;
  b) source residency: 168 MB exceeds VMEM (128 MB) while 42/84 MB can be
     staged; a bf16 source (84 MB, same 32-lane rows) or a y-split pair of
     half-size gathers should restore the fast rate if residency rules;
  c) neither (issue-rate floor): all variants measure the same.

Each variant gathers the SAME 1.31M rows/iteration as production (one
stage-3 lax.map iteration: 4 views x 512x640 points), warp-realistic
coherent-ish indices. Prints one JSON line per variant.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _time(f, *a, n=5):
    # axon gotcha: block_until_ready on a remote handle does not wait for
    # device completion — time through a scalar fetch (float()) of a
    # reduction computed INSIDE the jitted program instead
    float(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    v, hs, ws = 4, 512, 640
    n_src = hs * ws                      # 327,680 rows per view
    p = hs * ws                          # points per view per iteration
    rng = np.random.default_rng(0)

    # warp-like indices: mostly coherent (output pixel + small disparity),
    # like a real homography at stage-3's narrow hypothesis range
    base = np.arange(p, dtype=np.int64)
    shift = (rng.standard_normal((v, p)) * 40).astype(np.int64)
    idx_np = np.clip(base[None] + shift, 0, n_src - 1)
    idx = jnp.asarray(idx_np[..., None], jnp.int32)          # (V, P, 1)

    def gather(src, ix):
        # full-output sum so XLA cannot narrow the gather's slice sizes;
        # the reduce adds <1 ms of streaming on top of the gather cost
        out = jnp.take_along_axis(src, ix, axis=1, mode="promise_in_bounds")
        return jnp.sum(out, dtype=jnp.float32)

    g = jax.jit(gather)

    def report(name, c, dtype, t, rows, note=""):
        print(json.dumps({
            "variant": name, "channels": c, "dtype": str(dtype),
            "ns_per_row": round(t / rows * 1e9, 2),
            "ms": round(t * 1e3, 2), "note": note}), flush=True)

    # (0) production form: (V, n_src, 32) f32
    for c, dt, name in [
        (32, jnp.float32, "prod_32f32"),
        (128, jnp.float32, "padded_128f32"),
        (64, jnp.float32, "padded_64f32"),
        (32, jnp.bfloat16, "prod_32bf16"),
        (16, jnp.float32, "narrow_16f32"),
    ]:
        src = jnp.asarray(rng.standard_normal((v, n_src, c)), dt)
        t = _time(g, src, idx)
        report(name, c, dt, t, v * p)

    # (s2 control) stage-2 shape at the same row count: (4, 81920, 64) f32
    n2 = 256 * 320
    src2 = jnp.asarray(rng.standard_normal((v, n2, 64)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, n2, size=(v, p, 1)), jnp.int32)
    t = _time(g, src2, idx2)
    report("stage2_ctrl_64f32", 64, jnp.float32, t, v * p)

    # (split) two half-source gathers, half the points each (banding
    # best-case: residency hypothesis says both halves go fast)
    src = jnp.asarray(rng.standard_normal((v, n_src, 32)), jnp.float32)
    half = n_src // 2
    lo = jnp.asarray(np.clip(idx_np[:, : p // 2], 0, half - 1)[..., None],
                     jnp.int32)
    hi = jnp.asarray(
        (np.clip(idx_np[:, p // 2:], half, n_src - 1) - half)[..., None],
        jnp.int32)

    def split_gather(src, lo, hi):
        a = jnp.take_along_axis(src[:, :half], lo, axis=1,
                                mode="promise_in_bounds")
        b = jnp.take_along_axis(src[:, half:], hi, axis=1,
                                mode="promise_in_bounds")
        return jnp.sum(a, dtype=jnp.float32) + jnp.sum(b, dtype=jnp.float32)

    t = _time(jax.jit(split_gather), src, lo, hi)
    report("ysplit_2x_32f32", 32, jnp.float32, t, v * p,
           note="two half-source gathers, half points each")

    # (views-merged) one source (1, V*n_src, 32): does the batch axis cost?
    srcm = src.reshape(1, v * n_src, 32)
    idxm = (idx_np + (np.arange(v)[:, None] * n_src)).reshape(1, v * p, 1)
    t = _time(g, srcm, jnp.asarray(idxm, jnp.int32))
    report("merged_batch_32f32", 32, jnp.float32, t, v * p,
           note="single-batch source, same rows")


if __name__ == "__main__":
    main()
