"""End-to-end --test_general drive on CPU: fixture -> main.py extract ->
tsdf_fusion, at a small --img_wh (TPU-port extension flag).

Covers the GeneralFit branch of run_extract (reference main.py:160-176)
that the DTU-path tests don't touch, and doubles as a chip-independent
pipeline check.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.slow
def test_general_fit_extract_and_fuse(tmp_path):
    root = str(tmp_path / "fix")
    out = str(tmp_path / "out")
    # UFO_PLATFORM (not JAX_PLATFORMS): forces CPU via jax.config.update,
    # which wins over site hooks that pre-register accelerator plugins
    env = {**os.environ, "UFO_PLATFORM": "cpu"}

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "script", "make_general_fixture.py"),
         root, "scan_sphere"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "--extract_geometry", "--test_general", "--dataset", "blendedmvs",
         "--root_dir", root, "--test_scan", "scan_sphere", "--out_dir", out,
         "--test_ref_view", "0", "1", "2", "--test_n_view", "3",
         "--img_wh", "128", "96", "--test_ray_num", "512",
         "--test_sample_coarse", "16", "--test_sample_fine", "16",
         "--ndepths", "8,8,8", "--numdepth", "32", "--volume_reso", "96",
         "--volume_type", "correlation", "--mvs_depth_guide", "1",
         "--depth_pos_encoding", "--explicit_similarity", "--use_mask"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]

    depth_dir = os.path.join(out, "depth", "scan_sphere")
    files = sorted(os.listdir(depth_dir))
    assert [f for f in files if f.endswith(".npy")], files
    d = np.load(os.path.join(depth_dir, files[0]), allow_pickle=True).item()
    assert d["depth"].shape == (96, 128)
    assert np.isfinite(d["depth"]).all()
    assert d["intrinsic"].shape == (3, 3) and d["extrinsic"].shape == (4, 4)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tsdf_fusion.py"),
         "--out_dir", out, "--n_view", "3", "--voxel_size", "4",
         "--test_scan", "scan_sphere", "--dataset", "general"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "mesh", "scan_sphere.ply"))
