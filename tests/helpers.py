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


def fused_fwd_tol():
    """(rtol, atol) for fused-kernel vs exact-f32-reference forward checks.

    UFO_KERNEL_PRECISION=high really executes the bf16x3 split on every
    platform (a manual decomposition, not a precision flag CPU can ignore),
    so the fused forward carries ~1e-6-of-scale absolute error vs the
    exact-f32 reference; atol widens accordingly in that mode (measured
    2.06e-5 worst abs at unit scale through the attention/LN chain).
    """
    from uforecon_tpu.ops.kernel_precision import current_mode
    if current_mode() == "high":
        return 2e-4, 2e-4
    return 2e-4, 2e-5


class SyntheticDataset:
    """List-like dataset of synthetic sample dicts."""

    def __init__(self, n_samples=3, **kw):
        self.kw = kw
        self.n = n_samples

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return make_synthetic_sample(seed=int(i), **self.kw)


# ---------------------------------------------------------------------------
# Reference (PyTorch) test support: import /root/reference with the deps it
# needs stubbed. torchvision's deform_conv2d stub is a REAL (pure-torch)
# implementation so the reference FeatureNet/DCN path runs for golden tests.
# ---------------------------------------------------------------------------

REFERENCE_ROOT = "/root/reference"


def torch_bilinear_zeros(img, py, px):
    """Bilinear sample img (N,C,H,W) at (py, px) (N,HO,WO), zeros padding."""
    import torch

    n, c, h, w = img.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy = py - y0
    wx = px - x0
    y0 = y0.long()
    x0 = x0.long()
    flat = img.reshape(n, c, h * w)
    out = 0
    for ddy, ddx, wgt in ((0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                          (1, 0, wy * (1 - wx)), (1, 1, wy * wx)):
        yy = y0 + ddy
        xx = x0 + ddx
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = (yy.clamp(0, h - 1) * w + xx.clamp(0, w - 1))
        idx = idx.reshape(n, 1, -1).expand(n, c, idx[0].numel())
        v = torch.gather(flat, 2, idx).reshape(n, c, *py.shape[1:])
        out = out + v * (wgt * inb.to(img.dtype)).unsqueeze(1)
    return out


def torch_deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                        padding=(0, 0), dilation=(1, 1), mask=None):
    """Pure-torch torchvision.ops.deform_conv2d (DCNv2) for golden tests.

    Offset layout per torchvision: (N, 2*KK, HO, WO) with interleaved
    (dy_t, dx_t) channel pairs; sampling at p*stride - padding + k*dilation
    + offset, bilinear with zeros padding, optional modulation mask.
    """
    import torch

    def pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    sy, sx = pair(stride)
    py_, px_ = pair(padding)
    dy, dx = pair(dilation)
    n, c, h, w = input.shape
    cout, cin, kh, kw = weight.shape
    assert cin == c, "offset_groups > 1 not needed by the reference"
    hout = (h + 2 * py_ - dy * (kh - 1) - 1) // sy + 1
    wout = (w + 2 * px_ - dx * (kw - 1) - 1) // sx + 1
    kk = kh * kw
    off = offset.reshape(n, kk, 2, hout, wout)
    msk = (torch.ones(n, kk, hout, wout, dtype=input.dtype)
           if mask is None else mask.reshape(n, kk, hout, wout))

    oy = (torch.arange(hout, dtype=input.dtype) * sy - py_).view(1, -1, 1)
    ox = (torch.arange(wout, dtype=input.dtype) * sx - px_).view(1, 1, -1)
    out = torch.zeros(n, cout, hout, wout, dtype=input.dtype)
    wk = weight.reshape(cout, cin, kk)
    for t in range(kk):
        ky, kx = divmod(t, kw)
        pyy = oy + ky * dy + off[:, t, 0]
        pxx = ox + kx * dx + off[:, t, 1]
        val = torch_bilinear_zeros(input, pyy, pxx) * msk[:, t:t + 1]
        out = out + torch.einsum("oc,nchw->nohw", wk[:, :, t], val)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install_reference_stubs():
    """Idempotently stub kornia / torchvision / pytorch_lightning / piq /
    mcubes so /root/reference/code1 imports, and put it on sys.path."""
    import sys
    import types

    import torch

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        kornia.utils = types.ModuleType("kornia.utils")
        kornia.utils.create_meshgrid = lambda *a, **k: None
        sys.modules["kornia"] = kornia
        sys.modules["kornia.utils"] = kornia.utils
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.ops = types.ModuleType("torchvision.ops")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops
    # always (re)install the REAL implementation — an earlier fixture may
    # have stubbed it with a None-returning lambda
    tv.ops.deform_conv2d = torch_deform_conv2d
    tv.ops.DeformConv2d = object
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.seed_everything = lambda *a, **k: None
        sys.modules["pytorch_lightning"] = pl
    if "piq" not in sys.modules:
        piq = types.ModuleType("piq")
        piq.psnr = lambda *a, **k: torch.zeros(())
        sys.modules["piq"] = piq
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    if "mcubes" not in sys.modules:
        mc = types.ModuleType("mcubes")
        mc.marching_cubes = lambda *a, **k: (None, None)
        sys.modules["mcubes"] = mc
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _np_remap_bilinear(src, map_x, map_y, interpolation=None, **_kw):
    """Real cv2.remap(..., INTER_LINEAR) semantics in numpy: dst[y, x] =
    bilinear(src, map_x[y, x], map_y[y, x]); default BORDER_CONSTANT 0 means
    out-of-bounds corner neighbors contribute zero."""
    import numpy as np

    h, w = src.shape[:2]
    x = np.asarray(map_x, np.float64)
    y = np.asarray(map_y, np.float64)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    wx = x - x0
    wy = y - y0

    def at(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return src[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)] * inb

    out = (at(y0, x0) * (1 - wx) * (1 - wy)
           + at(y0, x0 + 1) * wx * (1 - wy)
           + at(y0 + 1, x0) * (1 - wx) * wy
           + at(y0 + 1, x0 + 1) * wx * wy)
    return out.astype(src.dtype)


def load_reference_numpy_module(relpath, name):
    """Import a numpy-level reference source file (tsdf_fusion.py,
    code1/utils/depth_fusion.py) under a non-colliding module name with its
    unavailable deps stubbed: numba.njit -> identity decorator (the decorated
    loops are plain python/numpy), prange -> range, cv2.remap -> a REAL
    numpy bilinear implementation, skimage.measure / plyfile / pycuda ->
    inert placeholders (only touched by mesh/IO paths the golden tests
    don't call). Same pattern as install_reference_stubs for code1."""
    import importlib.util
    import os
    import sys
    import types

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        numba.njit = njit
        numba.prange = range
        sys.modules["numba"] = numba
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        cv2.INTER_LINEAR = 1
        cv2.remap = _np_remap_bilinear
        sys.modules["cv2"] = cv2
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        measure = types.ModuleType("skimage.measure")
        measure.marching_cubes_lewiner = lambda *a, **k: (None,) * 4
        skimage.measure = measure
        sys.modules["skimage"] = skimage
        sys.modules["skimage.measure"] = measure
    if "plyfile" not in sys.modules:
        ply = types.ModuleType("plyfile")
        ply.PlyData = object
        ply.PlyElement = object
        sys.modules["plyfile"] = ply
    for mod in ("pycuda", "pycuda.driver", "pycuda.autoinit",
                "pycuda.compiler"):
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            if mod == "pycuda.compiler":
                m.SourceModule = object
            sys.modules[mod] = m
            if "." in mod:
                parent, child = mod.rsplit(".", 1)
                setattr(sys.modules[parent], child, m)

    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
