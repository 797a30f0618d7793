"""On-chip A/B: scattered volume gathers vs tile-local (brick) gathers.

VERDICT r2 item 2 — the decisive experiment for the 38k rays/s single-chip
ceiling. The dominant render cost (7.96 s/image, BASELINE.md profile) is
589.8M one-row `take_along_axis` reads from multi-GB corner-packed
correlation volumes at ~13.5 ns/row, while the same gather from small
sources was measured at 5.7-8.2 ns/row (in-cache regimes) and ~2.9 ns/row
(VMEM-resident). `script/tile_brick_stats.py` shows per-(ray-tile x z-seg)
frustum sub-bricks total only 0.38x the gather-row bytes, so if gathering
from a dynamically-sliced brick hits the small-source rate, the bucket
drops 2-4x.

Modes (env BENCH_MODE):
  sweep  - gather issue rate vs source size (random in-bounds indices),
           fixed 16M rows of 72 bf16 lanes. Establishes the rate curve.
  tiled  - per cascade stage: flat gather (current production form) vs
           scan-over-bricks [dynamic_slice(brick) + local gather], on REAL
           scene geometry (synthetic DTU-like cameras, 800x640, 64 coarse
           samples, 1 view). Checks bit-equality on a sample and times both.

Reference workload being accelerated: per-point trilinear sampling of the
three cascade stage volumes, /root/reference/code1/model.py:350-390.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

C8 = 72  # corner-packed feat||weight channels (8 corners x (8 feat + 1 w))


def _time(f, *a, n=3):
    import jax
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def sweep():
    import jax
    import jax.numpy as jnp

    rows = int(os.environ.get("SWEEP_ROWS", 16 * 2**20))
    report = []
    for src_mb in (1, 4, 16, 64, 256, 1024, 2048):
        n_src = src_mb * 2**20 // (C8 * 2)
        src = jnp.zeros((1, n_src, C8), jnp.bfloat16)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, n_src, size=(1, rows, 1)),
            jnp.int32)

        @jax.jit
        def g(s, i):
            return jnp.take_along_axis(s, i, axis=1, mode="promise_in_bounds")

        dt, _ = _time(g, src, idx)
        r = {"src_mb": src_mb, "rows": rows,
             "ns_per_row": round(dt / rows * 1e9, 2),
             "mrows_per_s": round(rows / dt / 1e6, 1)}
        report.append(r)
        print(json.dumps(r), flush=True)
    return report


def _stage_geometry(h, w, coarse, tile, zseg, view, stage_dims):
    """Real-geometry voxel indices + per-(tile x zseg) brick origins.

    Returns (flat_idx (P,), origins (n_bricks, 3), local_idx (n_bricks, pts),
    static brick dims (BD, BH, BW)). Points are ordered tile-major so the
    tiled variant is a pure reshape of the same workload.
    """
    from __graft_entry__ import _tiny_scene

    scene, ray_d = _tiny_scene(n_views=3, h=h, w=w, ndepth=192)
    pose = np.asarray(scene.source_poses)[view]
    ray_o = np.asarray(scene.ray_o)
    near, far = float(scene.near), float(scene.far)
    D, sh, sw = stage_dims

    rd = np.asarray(ray_d).reshape(h, w, 3)
    nty, ntx = h // tile, w // tile
    # tile-major ray order: (nty, ntx, tile, tile)
    rd = rd.reshape(nty, tile, ntx, tile, 3).transpose(0, 2, 1, 3, 4)
    rd = rd.reshape(nty * ntx, tile * tile, 3)

    z = near + (far - near) * (np.arange(coarse) + 0.5) / coarse  # (S,)
    n_seg = coarse // zseg
    pts = ray_o[None, None, None] + rd[:, None, :, :] * z[None, :, None, None]
    # (n_tiles, S, T2, 3) -> segment-major points per tile
    pts = pts.reshape(nty * ntx, n_seg, zseg, tile * tile, 3)

    # subsample tiles (every k-th): full-size SOURCE volumes keep the flat
    # gather in the big-source HBM regime, but 1/k of the rows keeps the two
    # (rows, C8) outputs under HBM (full image holds 2 x 4.7 GB -> OOM)
    every = int(os.environ.get("BENCH_TILE_EVERY", 4))
    pts = pts[::every]

    hom = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
    pr = hom @ pose.T
    zc = pr[..., 2]
    xy = pr[..., :2] / np.where(zc == 0, 1e-8, zc)[..., None]
    zn = (zc - near) / (far - near) * 2 - 1
    vx = np.clip((xy[..., 0] + 1) / 2 * (sw - 1), 0, sw - 1)
    vy = np.clip((xy[..., 1] + 1) / 2 * (sh - 1), 0, sh - 1)
    vz = np.clip((zn + 1) / 2 * (D - 1), 0, D - 1)
    ix = np.floor(vx).astype(np.int64)
    iy = np.floor(vy).astype(np.int64)
    iz = np.floor(vz).astype(np.int64)
    ix = np.minimum(ix, sw - 1)
    iy = np.minimum(iy, sh - 1)
    iz = np.minimum(iz, D - 1)
    flat = (iz * sh + iy) * sw + ix                     # (n_tiles, n_seg, zseg, T2)

    # brick bounds per (tile, seg)
    lo = np.stack([a.min(axis=(2, 3)) for a in (iz, iy, ix)], -1)  # (nt, ns, 3)
    hi = np.stack([a.max(axis=(2, 3)) for a in (iz, iy, ix)], -1)
    dims = hi - lo + 1
    bd, bh, bw = dims.max(axis=(0, 1))
    # pad static brick dims to TPU-friendly multiples (rows of the flattened
    # brick land on sublanes; keep W a multiple of 8 for clean strides)
    BD, BH, BW = int(bd), int(bh), int(-(-bw // 8) * 8)
    # clamp origins so static brick stays in bounds
    oz = np.clip(lo[..., 0], 0, D - BD)
    oy = np.clip(lo[..., 1], 0, sh - BH) if BH <= sh else np.zeros_like(lo[..., 1])
    ox = np.clip(lo[..., 2], 0, sw - BW) if BW <= sw else np.zeros_like(lo[..., 2])
    BH = min(BH, sh)
    BW = min(BW, sw)
    BD = min(BD, D)
    lidx = ((iz - oz[..., None, None]) * BH + (iy - oy[..., None, None])) * BW \
        + (ix - ox[..., None, None])
    origins = np.stack([oz, oy, ox], -1).reshape(-1, 3)
    lidx = lidx.reshape(origins.shape[0], -1)
    ok = (lidx >= 0) & (lidx < BD * BH * BW)
    return (flat.reshape(-1), origins.astype(np.int32),
            lidx.astype(np.int32), (BD, BH, BW), float(ok.mean()))


def tiled():
    import jax
    import jax.numpy as jnp
    from jax import lax

    h = int(os.environ.get("BENCH_H", 640))
    w = int(os.environ.get("BENCH_W", 800))
    coarse = int(os.environ.get("BENCH_COARSE", 64))
    tile = int(os.environ.get("BENCH_TILE", 16))
    zseg = int(os.environ.get("BENCH_ZSEG", 16))
    stages = {
        "stage1": (48, h // 4, w // 4),
        "stage2": (32, h // 2, w // 2),
        "stage3": (8, h, w),
    }
    out = []
    for name, (D, sh, sw) in stages.items():
        flat_idx, origins, lidx, (BD, BH, BW), ok = _stage_geometry(
            h, w, coarse, tile, zseg, 0, (D, sh, sw))
        vol = jnp.asarray(
            np.random.default_rng(1).normal(size=(D, sh, sw, C8)),
            jnp.bfloat16)
        volf = vol.reshape(1, -1, C8)
        gidx = jnp.asarray(flat_idx[None, :, None], jnp.int32)

        @jax.jit
        def flat_gather(v, i):
            return jnp.take_along_axis(v, i, axis=1, mode="promise_in_bounds")

        t_flat, ref_rows = _time(flat_gather, volf, gidx)

        o = jnp.asarray(origins)
        li = jnp.asarray(lidx)

        @jax.jit
        def brick_gather(v, o, li):
            def body(_, inp):
                org, l = inp
                brick = lax.dynamic_slice(
                    v, (org[0], org[1], org[2], 0), (BD, BH, BW, C8))
                rows = jnp.take_along_axis(
                    brick.reshape(-1, C8), l[:, None], axis=0,
                    mode="promise_in_bounds")
                return 0, rows
            _, rows = lax.scan(body, 0, (o, li))
            return rows

        t_brick, rows = _time(brick_gather, vol, o, li)
        same = bool(jnp.all(rows.reshape(-1, C8) == ref_rows[0]))
        n = flat_idx.size
        r = {"stage": name, "rows": n, "brick": [BD, BH, BW],
             "bricks": int(origins.shape[0]), "local_ok_frac": ok,
             "flat_ns_row": round(t_flat / n * 1e9, 2),
             "brick_ns_row": round(t_brick / n * 1e9, 2),
             "speedup": round(t_flat / t_brick, 2),
             "bit_equal": same}
        out.append(r)
        print(json.dumps(r), flush=True)
    return out


def pallas_gather_probe():
    """Can Mosaic lower a vectorized row gather from VMEM, and how fast?

    Kernel: rows[p, :] = src[idx[p], :] with src (4096, 128) bf16 resident in
    VMEM, idx (4096,) int32. Mosaic's tpu.dynamic_gather requires input,
    indices and output to share ONE shape (the sublane-shuffle form), so the
    row index is broadcast across lanes: out[i, j] = src[idx2[i, j], j] with
    idx2[i, j] = idx[i]. P == V per block by construction.
    If it lowers, times a grid of such gathers sized to one cascade
    stage-view's workload and reports ns/row for the in-VMEM regime.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, P = 4096, 4096
    n_blocks = int(os.environ.get("PROBE_BLOCKS", 2048))  # ~8.4M rows total

    def mk(form):
        def kernel(src_ref, idx_ref, out_ref):
            src = src_ref[...]
            idx = idx_ref[...]
            idx2 = jnp.broadcast_to(idx[:, None], src.shape)
            if form == "take_along_axis":
                out_ref[...] = jnp.take_along_axis(src, idx2, axis=0)
            else:
                out_ref[...] = jnp.take_along_axis(
                    src, idx2.astype(jnp.uint32), axis=0)

        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((V, 128), lambda i: (i, 0)),
                pl.BlockSpec((P,), lambda i: (i,)),
            ],
            out_specs=pl.BlockSpec((P, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_blocks * P, 128), jnp.bfloat16),
        )

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(n_blocks * V, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, size=(n_blocks * P,)), jnp.int32)

    for form in ("take_along_axis", "take"):
        try:
            f = jax.jit(mk(form))
            dt, out = _time(f, src, idx)
            rows = n_blocks * P
            print(json.dumps({
                "form": form, "lowered": True, "rows": rows,
                "ns_per_row": round(dt / rows * 1e9, 2),
                "mrows_per_s": round(rows / dt / 1e6, 1)}), flush=True)
            # spot-check correctness on the first block
            want = np.asarray(src[:V])[np.asarray(idx[:P])]
            ok = bool(np.array_equal(np.asarray(out[:P]), want))
            print(json.dumps({"form": form, "bit_equal_block0": ok}), flush=True)
        except Exception as e:  # lowering/runtime failure: record and move on
            print(json.dumps({
                "form": form, "lowered": False,
                "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "sweep")
    {"sweep": sweep, "tiled": tiled, "pallas": pallas_gather_probe}[mode]()
