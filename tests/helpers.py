"""Shared synthetic-scene builders for tests (no DTU data needed)."""
import numpy as np
import jax.numpy as jnp

from uforecon_tpu.models.uforecon import SceneInputs
from uforecon_tpu.ops import camera


def look_at(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """w2c extrinsic for a camera at `eye` looking at `target` (+z forward)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)  # note: right = forward x up for +z-forward convention
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = -R @ eye
    return E.astype(np.float32)


def make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16, radius=4.0, seed=0):
    """A ring of cameras looking at the origin over a unit-sphere scene.

    Returns (SceneInputs, extras dict) with geometry consistent across the
    NDC render path and the mm-scale MVS path (here the same scale).
    """
    rng = np.random.default_rng(seed)
    f = float(w)
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K
    norm = camera.ndc_normalize_matrix(w, h)

    extrs, poses_ndc, cam_pos = [], [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 8) * 0.25  # small arc
        eye = np.array([radius * np.sin(ang), 0.4 * i, -radius * np.cos(ang)])
        E = look_at(eye)
        extrs.append(E)
        poses_ndc.append(norm @ K4 @ E)
        cam_pos.append(np.linalg.inv(E)[:3, 3])
    extrs = np.stack(extrs)
    poses_ndc = np.stack(poses_ndc).astype(np.float32)
    cam_pos = np.stack(cam_pos).astype(np.float32)

    near = radius - 1.2
    far = radius + 1.2

    proj = {}
    base = np.zeros((n_views, 2, 4, 4), np.float32)
    for i in range(n_views):
        base[i, 0] = extrs[i]
        Ks = np.eye(4, dtype=np.float32)
        Ks[:3, :3] = K
        Ks[:2] /= 4
        base[i, 1] = Ks
    for s, mult in [(1, 1.0), (2, 2.0), (3, 4.0)]:
        p = base.copy()
        p[:, 1, :2] *= mult
        proj[f"stage{s}"] = jnp.asarray(p)

    imgs = rng.random((n_views, h, w, 3)).astype(np.float32)

    hp = camera.homo_pixel_grid(w, h)
    ray_o, ray_d = camera.build_rays(np.linalg.inv(poses_ndc[0]), hp)

    scene = SceneInputs(
        source_imgs=jnp.asarray(imgs),
        source_poses=jnp.asarray(poses_ndc),
        src_cam_pos=jnp.asarray(cam_pos),
        ref_cam_pos=jnp.asarray(cam_pos[0]),
        src_w2cs=jnp.asarray(extrs),
        near=jnp.float32(near),
        far=jnp.float32(far),
        ray_o=jnp.asarray(ray_o),
        proj_matrices=proj,
        depth_values=jnp.linspace(near, far, ndepth).astype(jnp.float32),
        scale_factor=jnp.float32(1.0),
    )
    extras = {
        "ray_d": jnp.asarray(ray_d.T),  # (HW, 3)
        "extrinsics": extrs,
        "intrinsics": K,
        "hw": (h, w),
    }
    return scene, extras


def make_synthetic_sample(n_views=3, h=32, w=32, ndepth=16, radius=4.0,
                          seed=0, start_idx=1):
    """A reference-format sample dict (SURVEY.md contract #1) on synthetic
    geometry — feeds scene_inputs_from_sample / the fit loop without DTU data.

    With start_idx=1 the first view acts as the held-out reference (train
    convention); poses/images arrays then cover views [start_idx:].
    """
    rng = np.random.default_rng(seed)
    f = float(w)
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K
    norm = camera.ndc_normalize_matrix(w, h)

    total = n_views + start_idx
    extrs, poses_ndc = [], []
    for i in range(total):
        ang = 2 * np.pi * i / max(total, 8) * 0.25
        eye = np.array([radius * np.sin(ang), 0.4 * i, -radius * np.cos(ang)])
        E = look_at(eye)
        extrs.append(E)
        poses_ndc.append(norm @ K4 @ E)
    extrs = np.stack(extrs).astype(np.float32)
    poses_ndc = np.stack(poses_ndc).astype(np.float32)
    poses_inv = np.stack([np.linalg.inv(p) for p in poses_ndc])

    near, far = radius - 1.2, radius + 1.2
    src = slice(start_idx, None)

    proj = {}
    base = np.zeros((n_views, 2, 4, 4), np.float32)
    for i in range(n_views):
        base[i, 0] = extrs[src][i]
        Ks = np.eye(4, dtype=np.float32)
        Ks[:3, :3] = K
        Ks[:2] /= 4
        base[i, 1] = Ks
    for s, mult in [(1, 1.0), (2, 2.0), (3, 4.0)]:
        p = base.copy()
        p[:, 1, :2] *= mult
        proj[f"stage{s}"] = p

    imgs = rng.random((total, h, w, 3)).astype(np.float32)
    hp = camera.homo_pixel_grid(w, h)
    ray_o, ray_d = camera.build_rays(np.linalg.inv(poses_ndc[0]), hp)
    cam_d = np.linalg.inv(K) @ np.asarray(hp)[:3]
    cam_ray_d = (cam_d / np.linalg.norm(cam_d, axis=0)).T.astype(np.float32)

    depths_h = (rng.random((total, h, w)) * (far - near) + near).astype(np.float32)

    return {
        "source_imgs": imgs[src],
        "ref_img": imgs[0],
        "w2cs": extrs,
        "intrinsics": np.tile(K[None], (total, 1, 1)),
        "near_fars": np.tile(np.array([[near, far]], np.float32), (total, 1)),
        "proj_matrices": proj,
        "depth_values_org_scale": np.linspace(near, far, ndepth).astype(np.float32),
        "depths_h": depths_h,
        "scale_mat": np.eye(4, dtype=np.float32),
        "scale_factor": np.float32(1.0),
        "ref_pose": poses_ndc[0],
        "ref_pose_inv": poses_inv[0],
        "source_poses": poses_ndc[src],
        "source_poses_inv": poses_inv[src],
        "ray_o": ray_o.astype(np.float32),
        "ray_d": np.asarray(ray_d.T, np.float32),
        "cam_ray_d": cam_ray_d,
        "meta": "synth-scanS-%08d" % 0,
        "start_idx": start_idx,
    }


class SyntheticDataset:
    """List-like dataset of synthetic sample dicts."""

    def __init__(self, n_samples=3, **kw):
        self.kw = kw
        self.n = n_samples

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return make_synthetic_sample(seed=int(i), **self.kw)
