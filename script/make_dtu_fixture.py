"""Synthetic DTU-test fixture: posed views of a textured sphere, mm scales.

Writes {root}/cameras/{vid:08d}_cam.txt and {root}/scan24/image/{vid:06d}.png
(1600x1200) for views 23 24 33 (+ 1 16 36), matching the DtuFitSparse layout
(reference dtu_test_sparse.py:75-436). Used by the verify recipe to drive
the full CLI pipeline without DTU data:

    python script/make_dtu_fixture.py /tmp/dtu_fixture
"""
import os, sys
import numpy as np
import cv2

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from uforecon_tpu.data.io import write_cam_file

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dtu_fixture"
VIEWS = [23, 24, 33, 1, 16, 36]
W, H = 1600, 1200
CENTER = np.array([0.0, 0.0, 600.0])   # sphere center, mm
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
    """CPU raytrace of a textured sphere + ground plane."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1)
    Kinv = np.linalg.inv(K)
    dirs_c = pix @ Kinv.T
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
    img[..., 0] = np.where(hit, tex * light, 0.08)
    img[..., 1] = np.where(hit, (1 - tex) * light, 0.1)
    img[..., 2] = np.where(hit, 0.5 * light, 0.12)
    rng = np.random.default_rng(0)
    img += 0.02 * rng.standard_normal(img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    os.makedirs(f"{ROOT}/cameras", exist_ok=True)
    os.makedirs(f"{ROOT}/scan24/image", exist_ok=True)
    f = 2900.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(7)
    for i, vid in enumerate(VIEWS):
        ang = 2 * np.pi * i / len(VIEWS)
        eye = CENTER + np.array(
            [420 * np.sin(ang), -180 + 40 * rng.random(), -420 * np.cos(ang)]
        )
        E = look_at(eye, CENTER)
        write_cam_file(f"{ROOT}/cameras/{vid:08d}_cam.txt", E, K,
                       [425.0, 2.5])
        img = render(E, K)
        cv2.imwrite(f"{ROOT}/scan24/image/{vid:06d}.png", img[..., ::-1])
        print("wrote view", vid)


if __name__ == "__main__":
    main()
