"""Profile one full-image render on the TPU chip and print the op-time
breakdown by HLO category plus the top ops.

Usage: python script/profile_render.py [--out /tmp/prof]
Env: BENCH_H/BENCH_W/BENCH_CHUNK shrink the workload (same as bench.py).

The render hot path is gather-bound (see BASELINE.md); this tool is how
those numbers are measured. Keep ONE process on the chip (axon tunnel).
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/prof")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _tiny_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon
    from uforecon_tpu.parallel.sharding import make_mesh
    from uforecon_tpu.pipeline.renderer import SceneRenderer

    h = int(os.environ.get("BENCH_H", 640))
    w = int(os.environ.get("BENCH_W", 800))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    from uforecon_tpu.config import perf_env_overrides
    cfg = Config(extract_geometry=True, test_sample_coarse=64,
                 test_sample_fine=64, volume_type="correlation",
                 compute_dtype=args.dtype, **perf_env_overrides())

    scene, ray_d = _tiny_scene(n_views=3, h=h, w=w, ndepth=192)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, scene, ray_d[:64], key)
    renderer = SceneRenderer(cfg, variables, mesh=make_mesh(1), chunk=chunk)

    enc = renderer.encode(scene)
    jax.block_until_ready(jax.tree_util.tree_leaves(enc)[0])

    n = ray_d.shape[0]
    near = np.full(n, 0.8, np.float32)
    far = np.full(n, 1.8, np.float32)
    ray_d = np.asarray(ray_d)

    out = renderer.render_rays(scene, enc, ray_d, near, far, key)  # compile
    t0 = time.perf_counter()
    out = renderer.render_rays(scene, enc, ray_d, near, far, key)
    t_render = time.perf_counter() - t0
    print(json.dumps({"render_s": round(t_render, 3),
                      "rays_per_s": round(n / t_render, 1)}))

    trace_dir = args.out
    with jax.profiler.trace(trace_dir):
        out = renderer.render_rays(scene, enc, ray_d, near, far, key)
    del out

    summarize(trace_dir)


def summarize(trace_dir, top=25):
    from xprof.convert import raw_to_tool_data as conv

    xplanes = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    data, _ = conv.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    import collections
    cat = collections.Counter()
    rows = []
    for r in d["rows"]:
        v = dict(zip(cols, [c["v"] for c in r["c"]]))
        cat[v["category"]] += v["total_self_time"]
        rows.append((v["total_self_time"], v["category"],
                     v["hlo_op_name"], v["occurrences"],
                     v.get("tf_op_name", "")))
    tot = sum(cat.values())
    print(f"profiled device total {tot/1e6:.2f}s")
    for c, t in cat.most_common(12):
        print(f"  {c:28s} {t/1e6:7.3f}s {100*t/tot:5.1f}%")
    rows.sort(reverse=True)
    print("--- top ops ---")
    for t, c, nme, occ, tf in rows[:top]:
        print(f"  {t/1e6:7.3f}s x{occ:5.0f} {c:20s} {nme[:28]:28s} {tf[-90:]}")


if __name__ == "__main__":
    main()
