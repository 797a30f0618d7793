"""Does a >128-lane packed row cost 1 gather unit or 2? (round-5 design probe)

The fused-stage-volume redesign (VERDICT r4 #1: merge each view's 3 stage
volumes into ONE 25-channel volume -> 3 gather rows/point instead of 9)
only pays if a corner-packed 8*25 = 200-lane bf16 row costs about the same
per row as today's 72-lane row. Round-2 measured per-row cost
width-independent UP TO a 128-lane tile from multi-GB sources (~13.5
ns/row); this measures across the tile boundary: 72 / 128 / 136 / 200 /
256 / 400 lanes at stage-2-like source scale (4.1 M rows), random
permutation indices (the volume gathers are effectively scattered).

Usage: python script/bench_wide_gather.py [--rows 4194304] [--reps 5]
Prints one JSON line per width.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_rows", type=int, default=32 * 320 * 400)
    ap.add_argument("--rows", type=int, default=1 << 22)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[72, 128, 136, 200, 256, 400])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, args.src_rows, size=args.rows, dtype=np.int64)
    idx = jnp.asarray(idx_np.astype(np.int32))[None, :, None]  # (1, P, 1)

    @jax.jit
    def gather_sum(flat, idx):
        rows = jnp.take_along_axis(flat, idx, axis=1,
                                   mode="promise_in_bounds")
        # scalar reduce so timing excludes host fetch of the big output
        return jnp.sum(rows.astype(jnp.float32))

    for c8 in args.widths:
        src = jnp.asarray(
            rng.standard_normal((args.src_rows, min(c8, 8))), jnp.bfloat16)
        # tile cheaply to full width to avoid a huge host->device transfer
        flat = jnp.tile(src, (1, (c8 + src.shape[1] - 1) // src.shape[1]))
        flat = flat[:, :c8][None]          # (1, M, C8) bf16
        gb = args.src_rows * c8 * 2 / 1e9
        # axon gotcha: block_until_ready on a remote handle does not wait
        # for device completion — time through a scalar float() fetch of
        # the in-program reduction (same as bench_warp_gather.py)
        float(gather_sum(flat, idx))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(gather_sum(flat, idx))
            best = min(best, time.perf_counter() - t0)
        ns_row = best / args.rows * 1e9
        print(json.dumps({
            "lanes": c8, "source_gb": round(gb, 2),
            "ns_per_row": round(ns_row, 2),
            "rows_per_s_m": round(args.rows / best / 1e6, 1),
        }), flush=True)
        del flat, src


if __name__ == "__main__":
    main()
