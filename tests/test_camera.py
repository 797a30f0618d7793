"""Camera geometry parity tests: RQ decomposition vs cv2, projection math."""
import cv2
import numpy as np

from uforecon_tpu.ops import camera, posenc


def random_projection(rng):
    K = np.array([[1200.0, 0, 320.0], [0, 1180.0, 256.0], [0, 0, 1.0]])
    angle = rng.standard_normal(3) * 0.4
    R, _ = cv2.Rodrigues(angle)
    t = rng.standard_normal(3) * 2 + np.array([0, 0, 4.0])
    E = np.eye(4)
    E[:3, :3], E[:3, 3] = R, t
    P = (K @ E[:3]).astype(np.float32)
    return P, K, E


def test_load_K_Rt_parity_with_cv2(rng):
    for _ in range(10):
        P, _, _ = random_projection(rng)
        intr, pose = camera.load_K_Rt_from_P(P)

        out = cv2.decomposeProjectionMatrix(P)
        K_cv = out[0] / out[0][2, 2]
        R_cv, t_cv = out[1], out[2]
        pose_cv = np.eye(4)
        pose_cv[:3, :3] = R_cv.T
        pose_cv[:3, 3] = (t_cv[:3] / t_cv[3])[:, 0]

        np.testing.assert_allclose(intr[:3, :3], K_cv, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pose, pose_cv, rtol=1e-4, atol=1e-4)


def test_load_K_Rt_roundtrip(rng):
    P, K, E = random_projection(rng)
    intr, pose = camera.load_K_Rt_from_P(P)
    np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(pose, np.linalg.inv(E), rtol=1e-4, atol=1e-4)


def test_project_points_ndc_matches_manual(rng):
    P, K, E = random_projection(rng)
    W, H = 640, 512
    norm = camera.ndc_normalize_matrix(W, H)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K
    ndc_pose = (norm @ K4 @ E).astype(np.float32)

    pts = (rng.standard_normal((100, 3)) * 0.5).astype(np.float32)
    xy, xyz, valid = camera.project_points_ndc(ndc_pose[None], pts)
    xy = np.asarray(xy)[0]
    valid = np.asarray(valid)[0]

    # manual projection with the same (float32) NDC matrix
    pts_h = np.concatenate([pts, np.ones((100, 1), np.float32)], axis=1)
    proj = (ndc_pose.astype(np.float64) @ pts_h.T.astype(np.float64)).T
    x_ndc = proj[:, 0] / proj[:, 2]
    y_ndc = proj[:, 1] / proj[:, 2]
    np.testing.assert_allclose(xy[:, 0], x_ndc, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(xy[:, 1], y_ndc, rtol=1e-3, atol=1e-3)
    cam = (E[:3, :3] @ pts.T + E[:3, 3:]).T
    np.testing.assert_array_equal(valid, (cam[:, 2] > 0).astype(np.float32))


def test_project_points_near_far_normalization(rng):
    P, K, E = random_projection(rng)
    norm = camera.ndc_normalize_matrix(64, 64)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K
    ndc_pose = (norm @ K4 @ E).astype(np.float32)
    pts = (rng.standard_normal((50, 3)) * 0.5).astype(np.float32)
    near, far = 2.0, 8.0
    _, xyz, _ = camera.project_points_ndc(ndc_pose[None], pts, near_far=(near, far))
    cam_z = ((E[:3, :3] @ pts.T + E[:3, 3:]).T)[:, 2]
    expect = (cam_z - near) / (far - near) * 2 - 1
    np.testing.assert_allclose(np.asarray(xyz)[0, :, 2], expect, rtol=1e-4, atol=1e-4)


def test_rays_unit_norm_and_origin(rng):
    W, H = 32, 24
    P, K, E = random_projection(rng)
    norm = camera.ndc_normalize_matrix(W, H)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = K
    pose = (norm @ K4 @ E).astype(np.float32)
    hp = camera.homo_pixel_grid(W, H)
    ray_o, ray_d = camera.build_rays(np.linalg.inv(pose), hp)
    np.testing.assert_allclose(np.linalg.norm(ray_d, axis=0), 1.0, atol=1e-5)
    # camera center maps to the origin of all rays
    np.testing.assert_allclose(ray_o, np.linalg.inv(E)[:3, 3], atol=1e-4)


def test_bounding_box_contains_frusta(rng):
    intrs, extrs, nfs = [], [], []
    for _ in range(3):
        P, K, E = random_projection(rng)
        K4 = np.eye(4)
        K4[:3, :3] = K
        intrs.append(K4)
        extrs.append(E)
        nfs.append([2.0, 6.0])
    center, radius, bnds = camera.get_boundingbox([512, 640], intrs, extrs, nfs)
    assert radius > 0
    assert np.all(bnds[:, 1] >= bnds[:, 0])
    scale_mat, sf = camera.cal_scale_mat([512, 640], intrs, extrs, nfs, factor=1.1)
    np.testing.assert_allclose(sf, 1.0 / scale_mat[0, 0], rtol=1e-6)


def test_order_posenc_matches_reference_impl():
    d_hid, n = 8, 16
    table = posenc.order_posenc(d_hid, n)
    ref = np.array(
        [
            [p / np.power(10000, 2 * (j // 2) / d_hid) for j in range(d_hid)]
            for p in range(n)
        ]
    )
    ref[:, 0::2] = np.sin(ref[:, 0::2])
    ref[:, 1::2] = np.cos(ref[:, 1::2])
    np.testing.assert_allclose(table, ref.astype(np.float32), atol=1e-6)


def test_nerf_posenc_matches_torch_reference(rng):
    import torch

    x = rng.standard_normal((10, 3)).astype(np.float32)
    ours = np.asarray(posenc.nerf_posenc(x, num_freqs=4, include_input=True))

    # reference implementation (ray_transformer.py:29-73)
    num_freqs = 4
    freqs = np.pi * 2.0 ** np.arange(0, num_freqs)
    _freqs = torch.repeat_interleave(torch.from_numpy(freqs.astype(np.float32)), 2).view(1, -1, 1)
    _phases = torch.zeros(2 * num_freqs)
    _phases[1::2] = np.pi * 0.5
    _phases = _phases.view(1, -1, 1)
    tx = torch.from_numpy(x)
    embed = tx.unsqueeze(1).repeat(1, num_freqs * 2, 1)
    embed = torch.sin(torch.addcmul(_phases, embed, _freqs)).view(x.shape[0], -1)
    ref = torch.cat((tx, embed), dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_sine_image_pe_matches_torch_reference():
    import math
    import torch

    d_model, H, W = 32, 12, 17
    ours = posenc.sine_image_pe(d_model, H, W)

    pe = torch.zeros((d_model, 600, 600))
    y_position = torch.ones((600, 600)).cumsum(0).float().unsqueeze(0)
    x_position = torch.ones((600, 600)).cumsum(1).float().unsqueeze(0)
    div_term = torch.exp(
        torch.arange(0, d_model // 2, 2).float() * (-math.log(10000.0) / (d_model // 2))
    )[:, None, None]
    pe[0::4] = torch.sin(x_position * div_term)
    pe[1::4] = torch.cos(x_position * div_term)
    pe[2::4] = torch.sin(y_position * div_term)
    pe[3::4] = torch.cos(y_position * div_term)
    ref = pe[:, :H, :W].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
