"""Benchmark: depth-map render throughput (rays/sec/chip) on real hardware.

Measures the reference's headline workload (BASELINE.md): one 800x640
depth-map render = 512k rays x (64 coarse + 64 fine) samples through the
full render path (similarity + correlation-volume queries + ray transformer
+ NeuS), after a one-time scene encode. The RTX-3090 reference renders this
as 640 sequential 800-ray torch chunks; we run one compiled XLA program.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is rays/sec relative to the reference GPU's implied
throughput (~13.1k rays/s: 512k rays in ~39s per view on a 3090 — the
closest published anchor for this exact pipeline; UFORecon reports ~0.5-1
min/view class runtimes on 3090-class hardware).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    _fail_fast_if_tunnel_down()
    # keep bench shapes identical to the reference eval workload where the
    # chip allows; override via env for smoke runs
    h = int(os.environ.get("BENCH_H", 640))
    w = int(os.environ.get("BENCH_W", 800))
    n_views = int(os.environ.get("BENCH_VIEWS", 3))
    chunk = int(os.environ.get("BENCH_CHUNK", 0)) or None

    import jax

    from uforecon_tpu.config import Config, perf_env_overrides
    from uforecon_tpu.models.uforecon import UFORecon
    from uforecon_tpu.pipeline.renderer import SceneRenderer
    from uforecon_tpu.parallel.sharding import make_mesh

    # BENCH_FUSED overrides the glue-kernel knobs (grouped cosine, view
    # fusion; the point/ray heads keep their own 'auto') for on-chip A/B.
    # Unset = the Config defaults ('never' — the measured-fastest setting).
    fused_glue = os.environ.get("BENCH_FUSED")
    # BENCH_BRICK=auto measures the tile-local brick-gather path (non-
    # default since the round-4 A/B: +0.4% for +78% volume HBM); unset /
    # 'never' measures the shipped flat default. BENCH_BRICK=pad isolates
    # the 72->128 volume lane padding with FLAT gathers (no plan): the
    # round-3 A/B only ever measured pad+bricks together.
    brick = os.environ.get("BENCH_BRICK", "never")
    # volume_merge='auto' (merged stage volumes, ops/volume_merge.py) is
    # the shipped default since round 5; BENCH_MERGE=never measures the
    # reference-exact per-stage path, BENCH_MERGE=pad lane-pads the packed
    # rows 200 -> 256 (merge_pad)
    merge = os.environ.get("BENCH_MERGE", "")
    # BENCH_MERGE_DEPTH overrides the common-grid z-bin count (default =
    # stage 3's ndepth = 8); memory scales linearly with it
    merge_depth = int(os.environ.get("BENCH_MERGE_DEPTH", "0"))
    cfg = Config(
        extract_geometry=True,
        test_sample_coarse=64,
        test_sample_fine=64,
        volume_type="correlation",
        volume_brick="auto" if brick == "pad" else brick,
        **({"fused_similarity": fused_glue,
            "fused_volume_fusion": fused_glue} if fused_glue else {}),
        **({"volume_merge": "never"} if merge in ("0", "never")
           else {"volume_merge": "auto", "merge_pad": merge == "pad",
                 "merge_depth": merge_depth} if merge else
           {"merge_depth": merge_depth} if merge_depth else {}),
        **perf_env_overrides(),
    )

    # full-size synthetic scene (model weights random — throughput is
    # weight-independent; chamfer configs need DTU data + trained weights)
    scene, ray_d = _build_scene(h, w, n_views)

    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, scene, ray_d[:64], key)

    renderer = SceneRenderer(cfg, variables, mesh=make_mesh(1), chunk=chunk)
    enc = renderer.encode(scene)
    jax.block_until_ready(jax.tree_util.tree_leaves(enc)[0])

    n = ray_d.shape[0]
    ray_d = np.asarray(ray_d)
    near = np.full(n, float(scene.near), np.float32)
    far = np.full(n, float(scene.far), np.float32)

    # tile-local brick gathers, exactly as render_depth_view engages them
    # (tile-major ray order + host covering-dims plan); BENCH_BRICK=never
    # measures the flat-gather path for A/B
    plan = None
    if brick == "auto":
        plan = renderer._plan_bricks(scene, enc, ray_d, near, far, (h, w))
    if plan is not None:
        from uforecon_tpu.ops.brick_plan import tile_order

        perm, _ = tile_order(h, w, cfg.brick_tile)
        ray_d, near, far = ray_d[perm], near[perm], far[perm]

    # warmup / compile
    out = renderer.render_rays(scene, enc, ray_d, near, far, key,
                               volume_brick=plan)
    assert np.all(np.isfinite(out["depth"]))

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = renderer.render_rays(
            scene, enc, ray_d, near, far, jax.random.PRNGKey(i),
            volume_brick=plan,
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    rays_per_sec = n / best

    # implied reference anchor: 512k rays / view at roughly 39 s/view on a
    # RTX 3090 (800-ray chunks through two transformer passes)
    baseline_rps = 13_100.0
    print(json.dumps({
        "metric": "depth_render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline_rps, 3),
        # whether tile-local brick gathers actually engaged: when the host
        # planner declines (can't certify / wrong backend / tiling mismatch)
        # the bench silently measures the flat path — this field says which
        "brick": plan is not None,
        # whether the merged-stage-volume path ran (Config.volume_merge)
        "merge": cfg.volume_merge == "auto",
        # resolved fused-kernel forward precision actually used
        # ('auto' -> 'fast' on this eval path; see config.kernel_precision)
        "kernel_precision": __import__(
            "uforecon_tpu.ops.kernel_precision",
            fromlist=["current_mode"]).current_mode(),
    }))


def _fail_fast_if_tunnel_down(metric="depth_render_rays_per_sec_per_chip",
                              unit="rays/s"):
    """When the axon relay is dead, device queries/compiles hang forever.

    Probe with a real tiny computation in a SUBPROCESS under a timeout —
    the relay's port layout is not stable across restarts, so a socket
    probe of a fixed port gives false negatives; only an end-to-end
    compile+execute proves the chip is usable. On failure emit the one
    required JSON line (value 0, with an error note) instead of hanging
    the driver; the last good measured number is in BASELINE.md.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # not a tunneled-TPU environment
    if os.environ.get("UFO_PLATFORM", "axon") != "axon":
        return  # platform forced off the tunnel (e.g. CPU smoke runs)
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "(x @ x).block_until_ready();"
        "print('PROBE_OK')"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True,
            timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", 240)),
        )
        ok = r.returncode == 0 and b"PROBE_OK" in r.stdout
        err = "" if ok else (r.stderr.decode(errors="replace")[-300:] or "rc!=0")
    except subprocess.TimeoutExpired:
        ok, err = False, "probe compute timed out"
    if not ok:
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": unit,
            "vs_baseline": 0.0,
            "error": f"tpu tunnel unusable: {err}",
        }))
        sys.exit(0)


def _build_scene(h, w, n_views):
    # reuse the driver-entry scene builder at full-size shapes
    from __graft_entry__ import _tiny_scene as make

    return make(n_views=n_views, h=h, w=w, ndepth=192)


if __name__ == "__main__":
    main()
