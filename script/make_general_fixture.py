"""Synthetic BlendedMVS-style fixture: posed views of a textured sphere.

Writes the GeneralFit layout (reference general_fit.py:59-62, 44):

    {root}/{scan}/cams/pair.txt
    {root}/{scan}/cams/{vid:08d}_cam.txt
    {root}/{scan}/blended_images/{vid:08d}_masked.jpg
    {root}/{scan}/masks/{vid:08d}_mask.jpg

Used to drive `main.py --extract_geometry --test_general` end to end
without BlendedMVS data (the DTU counterpart is make_dtu_fixture.py):

    python script/make_general_fixture.py /tmp/general_fixture
"""
import os, sys
import numpy as np
import cv2

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from uforecon_tpu.data.io import write_cam_file, write_pair_file

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/general_fixture"
SCAN = sys.argv[2] if len(sys.argv) > 2 else "scan_sphere"
N_VIEWS = 5
W, H = 768, 576
CENTER = np.array([0.0, 0.0, 600.0])
RADIUS = 120.0


def look_at(eye, target):
    eye = np.asarray(eye, np.float64)
    z = target - eye
    z /= np.linalg.norm(z)
    x = np.cross(z, [0.0, -1.0, 0.0])
    if np.linalg.norm(x) < 1e-6:
        x = np.cross(z, [1.0, 0.0, 0.0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    E = np.eye(4)
    E[:3, :3] = np.stack([x, y, z])
    E[:3, 3] = -E[:3, :3] @ eye
    return E


def render(E, K):
    """CPU raytrace of a textured sphere; returns (rgb, mask)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1)
    dirs_c = pix @ np.linalg.inv(K).T
    R = E[:3, :3]
    eye = -R.T @ E[:3, 3]
    dirs = dirs_c @ R
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    oc = eye - CENTER
    b = dirs @ oc
    c = oc @ oc - RADIUS ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    p = eye + t[..., None] * dirs
    n = (p - CENTER) / RADIUS
    u = np.arctan2(n[..., 0], n[..., 2])
    v = np.arccos(np.clip(n[..., 1], -1, 1))
    tex = 0.5 + 0.25 * np.sin(12 * u) * np.sin(10 * v) + 0.15 * np.sin(37 * u * v)
    light = np.clip(n @ np.array([0.4, -0.5, -0.76]), 0.1, 1.0)
    img = np.zeros((H, W, 3))
    img[..., 0] = np.where(hit, tex * light, 0.0)
    img[..., 1] = np.where(hit, (1 - tex) * light, 0.0)
    img[..., 2] = np.where(hit, 0.5 * light, 0.0)
    rng = np.random.default_rng(0)
    img += 0.02 * rng.standard_normal(img.shape) * hit[..., None]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), hit


def main():
    base = os.path.join(ROOT, SCAN)
    for d in ("cams", "blended_images", "masks"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    f = 1400.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(11)
    for vid in range(N_VIEWS):
        ang = 2 * np.pi * vid / N_VIEWS
        eye = CENTER + np.array(
            [420 * np.sin(ang), -180 + 40 * rng.random(), -420 * np.cos(ang)]
        )
        E = look_at(eye, CENTER)
        # MVSNet line-11 row: depth_min interval n_depth depth_max
        # (GeneralFit near/far = first/last entries, general_fit.py:71)
        write_cam_file(os.path.join(base, "cams", f"{vid:08d}_cam.txt"),
                       E, K, [425.0, 2.5, 192.0, 905.0])
        img, mask = render(E, K)
        cv2.imwrite(os.path.join(base, "blended_images", f"{vid:08d}_masked.jpg"),
                    img[..., ::-1])
        cv2.imwrite(os.path.join(base, "masks", f"{vid:08d}_mask.jpg"),
                    (mask * 255).astype(np.uint8))
        print("wrote view", vid)
    pairs = [(r, [(s, 10.0 - k) for k, s in enumerate(
        [v for v in range(N_VIEWS) if v != r])]) for r in range(N_VIEWS)]
    write_pair_file(os.path.join(base, "cams", "pair.txt"), pairs)
    print("wrote", os.path.join(base, "cams", "pair.txt"))


if __name__ == "__main__":
    main()
