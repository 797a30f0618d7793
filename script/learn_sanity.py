#!/usr/bin/env python
"""End-to-end learning sanity check on a synthetic textured-sphere scene.

Exercises the full training story without DTU data (the reference's
pretrained checkpoints are absent from its snapshot — SURVEY.md §5):

  1. raytrace a textured sphere from a ring of cameras (consistent
     multi-view rgb + ground-truth depth, reference sample-dict format),
  2. pretrain the cascade matcher on GT depth (pipeline/fit.pretrain_mvs,
     TransMVSNet-style entropy loss),
  3. train the render head (pipeline/fit.fit — frozen matcher, rgb+depth
     losses, reference model.py:552-566),
  4. render the held-out reference view and compare against analytic depth.

Success criterion: trained depth L1 (in units of the depth range) drops
well below the untrained render's. Run on TPU (minutes) or CPU with tiny
settings:

  python script/learn_sanity.py --mvs_steps 120 --render_steps 300
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SPHERE_R = 0.9
CAM_R = 4.0
NEAR, FAR = CAM_R - 1.2, CAM_R + 1.2


def _look_at(eye):
    eye = np.asarray(eye, np.float64)
    z = -eye / np.linalg.norm(eye)
    x = np.cross(z, [0.0, 1.0, 0.0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    E = np.eye(4)
    E[:3, :3] = np.stack([x, y, z])
    E[:3, 3] = -E[:3, :3] @ eye
    return E.astype(np.float32)


def _sphere_trace(ray_o, ray_d):
    """Ray-parameter t of the first sphere hit; t=0 where missed."""
    o = np.broadcast_to(np.asarray(ray_o, np.float64), ray_d.shape)
    d = np.asarray(ray_d, np.float64)
    a = np.sum(d * d, -1)
    b = 2.0 * np.sum(o * d, -1)
    c = np.sum(o * o, -1) - SPHERE_R ** 2
    disc = b * b - 4 * a * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
    hit &= t > 0
    return np.where(hit, t, 0.0).astype(np.float32), hit


def _shade(points, hit):
    n = points / SPHERE_R
    u = np.arctan2(n[..., 0], n[..., 2])
    v = np.arccos(np.clip(n[..., 1], -1, 1))
    tex = 0.5 + 0.22 * np.sin(9 * u) * np.sin(8 * v) + 0.18 * np.sin(23 * u + 17 * v)
    light = np.clip(n @ np.array([0.35, -0.5, -0.79]), 0.15, 1.0)
    img = np.empty(points.shape[:-1] + (3,), np.float32)
    img[..., 0] = np.where(hit, tex * light, 0.08)
    img[..., 1] = np.where(hit, (1.0 - tex) * light, 0.10)
    img[..., 2] = np.where(hit, (0.4 + 0.3 * np.sin(5 * u)) * light, 0.12)
    return np.clip(img, 0, 1)


def build_scene_views(n_total, h, w, seed=0):
    """Raytrace every camera of the ring once; returns per-view dicts."""
    from uforecon_tpu.ops import camera

    rng = np.random.default_rng(seed)
    f = float(w)
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K
    norm = camera.ndc_normalize_matrix(w, h)
    hp = camera.homo_pixel_grid(w, h)

    views = []
    for i in range(n_total):
        ang = 2 * np.pi * i / n_total
        eye = np.array([CAM_R * np.sin(ang),
                        0.35 * np.sin(2.1 * i + 0.5),
                        -CAM_R * np.cos(ang)])
        eye *= CAM_R / np.linalg.norm(eye)
        E = _look_at(eye)
        pose_ndc = (norm @ K4 @ E).astype(np.float32)
        ray_o, ray_d = camera.build_rays(np.linalg.inv(pose_ndc), hp)
        ray_d = np.asarray(ray_d.T, np.float32).reshape(h, w, 3)
        t, hit = _sphere_trace(ray_o, ray_d)
        pts = np.asarray(ray_o)[None, None] + t[..., None] * ray_d
        img = _shade(pts, hit)
        # camera-frame z-depth for MVS supervision
        pts_cam = pts @ E[:3, :3].T + E[:3, 3]
        zdepth = np.where(hit, pts_cam[..., 2], 0.0).astype(np.float32)
        cam_d = np.linalg.inv(K) @ np.asarray(hp)[:3]
        cam_ray_d = (cam_d / np.linalg.norm(cam_d, axis=0)).T.astype(np.float32)
        views.append(dict(E=E, pose_ndc=pose_ndc, K=K,
                          ray_o=np.asarray(ray_o, np.float32),
                          ray_d=ray_d.reshape(-1, 3), img=img,
                          t_depth=t, zdepth=zdepth, cam_ray_d=cam_ray_d))
    return views


def make_sample(views, ref, srcs, ndepth, h, w):
    """Reference-format sample dict (SURVEY.md contract #1), start_idx=1."""
    order = [ref] + list(srcs)
    vs = [views[i] for i in order]
    poses = np.stack([v["pose_ndc"] for v in vs])
    extrs = np.stack([v["E"] for v in vs])
    K = vs[0]["K"]

    n_src = len(srcs)
    proj = {}
    base = np.zeros((n_src, 2, 4, 4), np.float32)
    for i in range(n_src):
        base[i, 0] = extrs[1 + i]
        Ks = np.eye(4, dtype=np.float32)
        Ks[:3, :3] = K
        Ks[:2] /= 4
        base[i, 1] = Ks
    for s, mult in [(1, 1.0), (2, 2.0), (3, 4.0)]:
        p = base.copy()
        p[:, 1, :2] *= mult
        proj[f"stage{s}"] = p

    return {
        "source_imgs": np.stack([v["img"] for v in vs[1:]]),
        "ref_img": vs[0]["img"],
        "w2cs": extrs,
        "intrinsics": np.tile(K[None], (len(vs), 1, 1)),
        "near_fars": np.tile(np.array([[NEAR, FAR]], np.float32), (len(vs), 1)),
        "proj_matrices": proj,
        "depth_values_org_scale": np.linspace(NEAR, FAR, ndepth).astype(np.float32),
        "depths_h": np.stack([v["t_depth"] for v in vs]),
        "depths_mm": np.stack([v["zdepth"] for v in vs]),
        "scale_mat": np.eye(4, dtype=np.float32),
        "scale_factor": np.float32(1.0),
        "ref_pose": poses[0],
        "ref_pose_inv": np.linalg.inv(poses[0]),
        "source_poses": poses[1:],
        "source_poses_inv": np.stack([np.linalg.inv(p) for p in poses[1:]]),
        "ray_o": vs[0]["ray_o"],
        "ray_d": vs[0]["ray_d"],
        "cam_ray_d": vs[0]["cam_ray_d"],
        "meta": f"sanity-sphere-{ref:08d}",
        "start_idx": 1,
    }


class SphereDataset:
    def __init__(self, views, n_src, ndepth, h, w):
        self.views = views
        self.n_src = n_src
        self.ndepth, self.h, self.w = ndepth, h, w

    def __len__(self):
        return len(self.views)

    def __getitem__(self, i):
        n = len(self.views)
        srcs = [(i + 1 + k) % n for k in range(self.n_src)]
        return make_sample(self.views, i, srcs, self.ndepth, self.h, self.w)


def render_depth_error(renderer, sample, seed=0):
    """Render the sample's reference view; masked L1 vs analytic depth,
    normalized by the depth span."""
    import jax

    from uforecon_tpu.data.convert import scene_inputs_from_sample

    scene, extras = scene_inputs_from_sample(sample)
    enc = renderer.encode(scene)
    n = extras["ray_d"].shape[0]
    near = np.full(n, NEAR, np.float32)
    far = np.full(n, FAR, np.float32)
    out = renderer.render_rays(scene, enc, extras["ray_d"], near, far,
                               jax.random.PRNGKey(seed))
    gt = sample["depths_h"][0].reshape(-1)
    m = gt > 0
    err = np.abs(out["depth"][m] - gt[m]).mean() / (FAR - NEAR)
    return float(err)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=160)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--n_src", type=int, default=3)
    ap.add_argument("--ndepth", type=int, default=64)
    ap.add_argument("--mvs_steps", type=int, default=120)
    ap.add_argument("--render_steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--dtype", default="float32",
                    help="compute_dtype: the bfloat16 row is the "
                         "reference-AMP-parity train config (BASELINE.md "
                         "round 5); this gates its learning end-to-end")
    ap.add_argument("--logdir", type=str, default="/tmp/learn_sanity")
    ap.add_argument("--mesh_eval", action="store_true",
                    help="also TSDF-fuse all views and score the mesh "
                         "against the analytic sphere")
    ap.add_argument("--resume", action="store_true",
                    help="skip training; restore the latest checkpoint "
                         "from logdir and only evaluate")
    args = ap.parse_args()

    from uforecon_tpu.config import Config, perf_env_overrides
    from uforecon_tpu.pipeline.fit import fit, pretrain_mvs

    cfg = Config(
        ndepths=(24, 16, 8),
        numdepth=args.ndepth,
        coarse_sample=32,
        fine_sample=32,
        test_sample_coarse=32,
        test_sample_fine=32,
        train_ray_num=512,
        train_n_view=args.n_src + 1,
        uforecon_lr=args.lr,
        volume_type="correlation",
        compute_dtype=args.dtype,
        logdir=args.logdir,
        exp_name="sanity",
        max_epochs=1,
        **perf_env_overrides(),
    )

    print(f"raytracing {args.views} views at {args.w}x{args.h}...", flush=True)
    views = build_scene_views(args.views, args.h, args.w)
    ds = SphereDataset(views, args.n_src, args.ndepth, args.h, args.w)

    if args.resume:
        from uforecon_tpu.pipeline.checkpoint import CheckpointManager

        mgr = CheckpointManager(
            os.path.join(args.logdir, cfg.exp_name, "ckpt"))
        step = mgr.latest_step()
        assert step is not None, "no checkpoint to resume from"
        restored = mgr.restore(step)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        print(f"restored step {step}", flush=True)
        result = {"resumed_step": int(step)}
        renderer = make_renderer(cfg, variables)
        # depth L1 of the restored weights through THIS cfg's render path:
        # with UFO_VOLUME_MERGE=auto this evaluates exact-trained weights
        # through the merged-volume renderer (the production configuration
        # for the round-5 redesign: train exact, render merged)
        result["depth_l1"] = round(render_depth_error(renderer, ds[0]), 4)
        if args.mesh_eval:
            result.update(mesh_eval(renderer, ds))
        print(json.dumps(result))
        return 0 if result.get("mesh_pass", True) else 1

    print("stage 1: MVS pretraining...", flush=True)
    state = pretrain_mvs(cfg, train_ds=ds, max_steps=args.mvs_steps,
                         log_every=20, n_workers=2)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    renderer = make_renderer(cfg, variables)
    err0 = render_depth_error(renderer, ds[0])
    print(f"depth L1 (pre render-training): {err0:.4f} of depth span", flush=True)

    print("stage 2: render-head training...", flush=True)
    state = fit(cfg, train_ds=ds, val_ds=[ds[0]], variables=variables,
                max_steps=args.render_steps, val_every=args.render_steps,
                log_every=25, n_workers=2)
    # the compiled render program takes variables as an argument, so
    # swapping them on the same renderer avoids a full re-jit
    renderer.variables = {"params": state.params,
                          "batch_stats": state.batch_stats}
    err1 = render_depth_error(renderer, ds[0])
    result = {
        "depth_l1_before": round(err0, 4),
        "depth_l1_after": round(err1, 4),
        "improvement": round(err0 / max(err1, 1e-9), 2),
        "pass": bool(err1 < err0 * 0.6),
    }
    if args.mesh_eval:
        result.update(mesh_eval(renderer, ds))
    print(json.dumps(result))
    return 0 if result["pass"] and result.get("mesh_pass", True) else 1


def make_renderer(cfg, variables):
    from uforecon_tpu.parallel.sharding import make_mesh
    from uforecon_tpu.pipeline.renderer import SceneRenderer

    return SceneRenderer(cfg.replace(extract_geometry=True), variables,
                         mesh=make_mesh(1), chunk=1024)


def mesh_eval(renderer, ds):
    """Fuse all trained-view depths into a TSDF mesh; score vertex distance
    to the analytic sphere (both directions, like the DTU acc/comp split)."""
    import jax

    from uforecon_tpu.data.convert import scene_inputs_from_sample
    from uforecon_tpu.fusion.tsdf import TSDFVolume

    m = 1.12 * SPHERE_R
    vol = TSDFVolume(np.array([[-m, m], [-m, m], [-m, m]]),
                     voxel_size=2 * m / 128, margin=5)
    for i in range(len(ds)):
        sample = ds[i]
        scene, extras = scene_inputs_from_sample(sample)
        enc = renderer.encode(scene)
        n = extras["ray_d"].shape[0]
        near = np.full(n, NEAR, np.float32)
        far = np.full(n, FAR, np.float32)
        out = renderer.render_rays(scene, enc, extras["ray_d"], near, far,
                                   jax.random.PRNGKey(i))
        h, w = sample["ref_img"].shape[:2]
        # ray parameter t -> camera z-depth: z = t * (R_cam_z . ray_d_world)
        dz = extras["ray_d"] @ sample["w2cs"][0][2, :3]
        zdepth = (out["depth"] * dz).reshape(h, w)
        # mask rays the model marked empty (background depth is untrained)
        zdepth = np.where(out["opacity"].reshape(h, w) > 0.5, zdepth, 0.0)
        # foreground-mask the depth like the reference's masked path
        # (general_fit.py use_mask / clean_mesh object masks): silhouette-
        # adjacent background rays have confident but untrained depth
        zdepth = np.where(sample["depths_h"][0] > 0, zdepth, 0.0)
        c2w = np.linalg.inv(sample["w2cs"][0]).astype(np.float32)
        vol.integrate(zdepth.astype(np.float32),
                      sample["intrinsics"][0].astype(np.float32), c2w)
    verts, faces, _ = vol.get_mesh()
    if len(verts) == 0:
        return {"mesh_verts": 0, "mesh_pass": False}
    # keep the dominant connected component (clean_mesh.py:249-267 analog):
    # background rays with confident-but-untrained depth leave junk islands
    from uforecon_tpu.postproc.clean_mesh import (_compact,
                                                  face_connected_components)

    comp = face_connected_components(np.asarray(faces))
    counts = np.bincount(comp)
    verts, faces = _compact(verts, np.asarray(faces)[comp == counts.argmax()])
    d_acc = np.abs(np.linalg.norm(verts, axis=1) - SPHERE_R)
    # completeness: sample the sphere, nearest mesh vertex
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((2000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    from scipy.spatial import cKDTree
    d_comp, _ = cKDTree(verts).query(dirs * SPHERE_R)
    return {
        "mesh_verts": int(len(verts)),
        "mesh_acc_mean": round(float(d_acc.mean()), 4),
        "mesh_comp_mean": round(float(d_comp.mean()), 4),
        "mesh_pass": bool(d_acc.mean() < 0.1 * SPHERE_R
                          and d_comp.mean() < 0.1 * SPHERE_R),
    }


if __name__ == "__main__":
    sys.exit(main())
