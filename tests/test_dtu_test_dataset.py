"""DtuFitSparse on synthetic DTU-format fixture files."""
import os

import numpy as np
import pytest

from uforecon_tpu.data import io
from uforecon_tpu.data.convert import scene_inputs_from_sample
from uforecon_tpu.data.dtu_test import DtuFitSparse

from helpers import look_at


@pytest.fixture
def dtu_dir(tmp_path, rng):
    """Minimal DTU_TEST-style tree: cameras/ + scan1/image/."""
    import cv2

    root = tmp_path / "DTU_TEST"
    (root / "cameras").mkdir(parents=True)
    (root / "scan1" / "image").mkdir(parents=True)

    K = np.array([[1400.0, 0, 800.0], [0, 1400.0, 600.0], [0, 0, 1.0]], np.float32)
    for vid in range(4):
        ang = 0.3 * vid
        eye = np.array([600 * np.sin(ang), 40.0 * vid, -600 * np.cos(ang)])
        E = look_at(eye)
        io.write_cam_file(
            root / "cameras" / f"{vid:08d}_cam.txt", E, K, [425.0, 2.5]
        )
        img = (rng.random((1200, 1600, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "scan1" / "image" / f"{vid:06d}.png"), img)
    return str(root)


def test_dtu_fit_sparse_sample_structure(dtu_dir):
    ds = DtuFitSparse(dtu_dir, "scan1", n_views=3, img_wh=[160, 128],
                      original_img_wh=[1600, 1200], test_view_pair=[0, 1, 2])
    assert len(ds) == 3
    s = ds[0]
    h, w = 128, 160
    assert s["source_imgs"].shape == (3, h, w, 3)
    assert s["source_poses"].shape == (3, 4, 4)
    assert s["ray_d"].shape == (h * w, 3)
    assert s["cam_ray_d"].shape == (h * w, 3)
    assert s["proj_matrices"]["stage1"].shape == (3, 2, 4, 4)
    assert s["depth_values_org_scale"].shape == (192,)
    # 1.06 interval widening (reference dtu_test_sparse.py:204)
    dv = s["depth_values_org_scale"]
    np.testing.assert_allclose(dv[1] - dv[0], 2.5 * 1.06, rtol=1e-5)
    assert s["start_idx"] == 0
    assert s["meta"].endswith("-scan1-00000000")

    # geometric sanity: cameras end up on a ~unit sphere shell
    cam_dists = np.linalg.norm(
        np.stack([np.linalg.inv(w)[ :3, 3] for w in s["w2cs"]]), axis=1
    )
    nf = s["near_fars"]
    np.testing.assert_allclose(nf[:, 0], 0.95 * (cam_dists - 1), rtol=1e-4)
    np.testing.assert_allclose(nf[:, 1], 1.05 * (cam_dists + 1), rtol=1e-4)

    # rays are unit norm and start at the render camera origin
    np.testing.assert_allclose(np.linalg.norm(s["ray_d"], axis=1), 1.0, atol=1e-5)

    # render pose differs from source pose by the 25mm x-offset (scaled)
    s1 = ds[1]
    assert not np.allclose(s1["ref_pose"], s1["source_poses"][1])


def test_dtu_sample_projects_consistently(dtu_dir):
    """A world point on a source ray projects back to that pixel's NDC."""
    ds = DtuFitSparse(dtu_dir, "scan1", n_views=3, img_wh=[160, 128],
                      original_img_wh=[1600, 1200], test_view_pair=[0, 1, 2])
    s = ds[0]
    # take the central pixel's ray of the render view, walk to mid z range
    hw = 128 * 160
    pix = hw // 2 + 80
    t = 0.5 * (s["near_fars"][0, 0] + s["near_fars"][0, 1])
    ray_o = s["ray_o"]
    p = ray_o + t * s["ray_d"][pix]
    # project through the render-view NDC pose: must match homo pixel coords
    proj = s["ref_pose"] @ np.append(p, 1.0)
    xy = proj[:2] / proj[2]
    iy, ix = divmod(pix, 160)
    expect_x = ix * 2 / (160 - 1) - 1
    expect_y = iy * 2 / (128 - 1) - 1
    np.testing.assert_allclose(xy, [expect_x, expect_y], atol=1e-4)


def test_scene_inputs_conversion(dtu_dir):
    ds = DtuFitSparse(dtu_dir, "scan1", n_views=3, img_wh=[160, 128],
                      original_img_wh=[1600, 1200], test_view_pair=[0, 1, 2])
    scene, extras = scene_inputs_from_sample(ds[0])
    assert scene.source_imgs.shape == (3, 128, 160, 3)
    assert scene.src_w2cs.shape == (3, 4, 4)  # start_idx=0 keeps all views
    assert scene.depth_values.shape == (192,)
    assert extras["ray_d"].shape == (128 * 160, 3)
    assert float(scene.near) > 0 and float(scene.far) > float(scene.near)
