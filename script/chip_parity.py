"""On-chip parity check: fused Pallas kernels vs the pure flax path.

CPU interpret-mode tests can NEVER catch TPU matmul-precision bugs (the
MXU rounds f32 dot inputs to bf16 at default precision; CPU ignores the
precision flag entirely), so any change to the fused kernels or their
precision setting must be re-validated ON THE CHIP at real shapes:

    python script/chip_parity.py                   # forward + grads
    UFO_KERNEL_PRECISION=high python script/chip_parity.py

Runs one render chunk (default 1024 rays x 64+64 samples at 256x320,
3 views — the real kernel block shapes) twice from identical params and
inputs: fused_point_head='always' vs 'never', and compares

  * coarse depth / rgb / opacity strictly (no discrete resampling between
    the paths at this stage), and
  * fine depth at p50/p99/max — a ~1e-6 forward difference can flip an
    importance-CDF bin for isolated rays (discrete selection), which moves
    those rays' fine samples legitimately; p99 is the stable observable
    (see the tpu-matmul-precision-trap memory / BASELINE.md).
  * parameter gradients of a train-style rgb+depth loss (the fused path's
    custom VJP is the pure-JAX reference; this catches fwd/bwd precision
    de-sync, the failure mode that diverged training in round 2). Strictly
    gated on the COARSE-loss whole-tree L2 relative error (no discrete
    resampling between paths there; every fused kernel still runs);
    loosely gated on the FINE-loss grads, where CDF bin flips from ~1e-6
    forward noise legitimately move isolated rays' samples (measured 2.9%
    tree-L2 on chip at 1.7e-7 coarse forward parity).

Prints one JSON line; exit 1 on tolerance violation. Keep ONE process on
the chip (axon tunnel).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=64)
    ap.add_argument("--skip_grads", action="store_true")
    # both paths run true f32 at HIGHEST; 'high' adds ~1e-6 rel fwd error.
    # The env var is applied here (entry point) onto Config.kernel_precision;
    # model/ops code reads only the typed Config (round-5 env-knob fold).
    prec = os.environ.get("UFO_KERNEL_PRECISION", "highest")
    ap.add_argument("--tol_coarse", type=float,
                    default=1e-4 if prec == "highest" else 3e-3)
    ap.add_argument("--tol_fine_p99", type=float,
                    default=1e-3 if prec == "highest" else 1e-2)
    ap.add_argument("--tol_grad", type=float, default=5e-3)
    ap.add_argument("--tol_grad_fine", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene
    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    # Gate 0 — one-hot contraction exactness ON THIS BACKEND. The CPU
    # tests cannot catch backend-specific simplifications: round 5 found
    # XLA:TPU deleting the f32->bf16->f32 round-trip inside _split3
    # ("excess precision" folding), silently degrading every 'exact'
    # one-hot fetch/permutation to a single bf16 dot (~2e-3), which blew
    # up the importance-sampler's small-denominator interpolation into
    # wild z extrapolations. Assert bit-exactness here so any future
    # compiler change re-breaking it fails the gate loudly.
    import numpy as _np

    from uforecon_tpu.ops.exact_onehot import (exact_onehot_matmul,
                                               exact_transpose)

    _rng = _np.random.default_rng(0)
    _vals = (_rng.random((4, 37, 3)) * 2 - 1).astype(_np.float32)
    _vals[1] *= 1e4
    _idx = _rng.integers(0, 37, (4, 29))
    _oh = (_np.arange(37)[None, None, :] == _idx[..., None]).astype(_np.float32)
    _got = _np.asarray(jax.jit(exact_onehot_matmul)(
        jnp.asarray(_oh), jnp.asarray(_vals)))
    _ref = _np.take_along_axis(_vals, _idx[..., None], axis=1)
    assert _np.array_equal(_got, _ref), (
        "exact_onehot_matmul NOT exact on this backend: max diff "
        f"{_np.abs(_got - _ref).max()}")
    _t = _np.asarray(jax.jit(exact_transpose)(jnp.asarray(_vals)))
    assert _np.array_equal(_t, _np.swapaxes(_vals, -1, -2)), \
        "exact_transpose NOT exact on this backend"
    print(json.dumps({"gate0_onehot_exact": True,
                      "platform": jax.default_backend()}), flush=True)

    def cfg_for(fused):
        # 'always' turns on EVERY fused render kernel (point head, ray
        # head via fused_point_head's routing, grouped cosine, view
        # fusion) vs the pure-XLA 'never' path
        return Config(test_sample_coarse=args.coarse,
                      test_sample_fine=args.fine,
                      coarse_sample=args.coarse, fine_sample=args.fine,
                      volume_type="correlation", fused_point_head=fused,
                      fused_similarity=fused, fused_volume_fusion=fused,
                      kernel_precision=prec)

    scene, ray_d = _tiny_scene(n_views=3, h=args.h, w=args.w, ndepth=192)
    rays = ray_d[:args.rays]
    key = jax.random.PRNGKey(0)

    model_ref = UFORecon(cfg_for("never"))
    model_fused = UFORecon(cfg_for("always"))
    variables = jax.jit(model_ref.init)(key, scene, rays[:64], key)

    out_ref = jax.jit(model_ref.apply)(variables, scene, rays, key)
    out_fused = jax.jit(model_fused.apply)(variables, scene, rays, key)

    report = {"platform": jax.default_backend(), "precision": prec,
              "rays": args.rays, "hw": [args.h, args.w]}
    ok = True

    def diff(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = np.abs(a - b) / (np.abs(b) + 1e-3)
        return d

    for k in ("depth", "rgb", "opacity"):
        d = diff(out_fused["coarse"][k], out_ref["coarse"][k])
        report[f"coarse_{k}_max"] = float(d.max())
        ok &= bool(d.max() < args.tol_coarse)
    d = diff(out_fused["fine"]["depth"], out_ref["fine"]["depth"])
    report["fine_depth_p50"] = float(np.quantile(d, 0.5))
    report["fine_depth_p99"] = float(np.quantile(d, 0.99))
    report["fine_depth_max"] = float(d.max())
    ok &= bool(report["fine_depth_p99"] < args.tol_fine_p99)
    ok &= bool(np.isfinite(np.asarray(out_fused["fine"]["depth"])).all())

    if not args.skip_grads:
        def loss_fn(mdl, pass_name):
            def f(params):
                out = mdl.apply({**variables, "params": params},
                                scene, rays[:256], key)
                return (jnp.mean(out[pass_name]["rgb"]) +
                        jnp.mean(out[pass_name]["depth"]))
            return f

        def grad_tree_diff(pass_name):
            g_ref = jax.jit(jax.grad(loss_fn(model_ref, pass_name)))(
                variables["params"])
            g_fused = jax.jit(jax.grad(loss_fn(model_fused, pass_name)))(
                variables["params"])
            # Whole-tree L2 relative error: a fwd/bwd precision de-sync
            # (the round-2 failure mode) perturbs the gradient broadly,
            # while per-leaf max-relative error is noise-dominated on
            # deep-U-Net BIAS leaves (grads are sums over ~1e5 spatial
            # positions with heavy cancellation — measured 3.6% element
            # noise at 1e-7 forward parity).
            num = den = 0.0
            leaf_rel = []
            for (path, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(g_fused),
                    jax.tree_util.tree_leaves_with_path(g_ref)):
                a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
                num += float(np.sum((a - b) ** 2))
                den += float(np.sum(b ** 2))
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                leaf_rel.append(
                    (float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6)),
                     name))
            leaf_rel.sort(reverse=True)
            return (float(np.sqrt(num / max(den, 1e-30))),
                    [{"leaf": n, "max_rel": r} for r, n in leaf_rel[:3]])

        # STRICT gate on a coarse-output loss: no discrete importance
        # resampling between the two paths at this stage, so any tree-L2
        # excess is a genuine fwd/bwd de-sync. Every fused kernel (point
        # head, ray head, grouped cosine, volume fusion) runs in the
        # coarse pass, so coverage is complete.
        rel, worst = grad_tree_diff("coarse")
        report["grad_tree_rel_l2"] = rel
        report["grad_worst_leaves"] = worst
        ok &= rel < args.tol_grad
        # LOOSE gate on the fine-output loss: a ~1e-6 forward difference
        # can flip an importance-CDF bin for isolated rays (discrete
        # selection), which moves those rays' fine SAMPLES legitimately —
        # their gradients then differ by O(1) per flipped ray (measured
        # 2.9% tree-L2 on chip at 1.7e-7 coarse forward parity). Only
        # wild divergence (a broken fine-pass VJP) is gated here.
        rel_f, worst_f = grad_tree_diff("fine")
        report["grad_fine_tree_rel_l2"] = rel_f
        report["grad_fine_worst_leaves"] = worst_f
        ok &= rel_f < args.tol_grad_fine

    report["ok"] = bool(ok)
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
