"""Geometry extraction driver: render every view's depth map to disk.

Reproduces the reference output layout (SURVEY.md inter-layer contract #2,
reference model.py:761-842):
    {out_dir}/depth/{scan}/{name}.npy   {"depth": HxW mm, "extrinsic", "intrinsic"}
    {out_dir}/depth/{scan}/{name}.png   normalized preview
    {out_dir}/rgb/{scan}/{name}.jpg
    {out_dir}/{scan}/depth/{name}.png   (legacy duplicate location)

Naming: the DTU test dataset produces zero-padded indices ("00000000"),
GeneralFit produces "refview{N}" — both fusers in this package read either
(the reference's tsdf/depth_fusion naming mismatch, SURVEY.md §3.2, is
resolved on the *read* side).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data.convert import scene_inputs_from_sample
from .renderer import SceneRenderer


def save_depth_outputs(out_dir: str, scan: str, name: str,
                       depth_mm: np.ndarray, rgb: np.ndarray,
                       extrinsic: np.ndarray, intrinsic: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "depth", scan), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "rgb", scan), exist_ok=True)
    os.makedirs(os.path.join(out_dir, scan, "depth"), exist_ok=True)

    dmax = max(float(depth_mm.max()), 1e-6)
    dpng = ((depth_mm / dmax) * 255).astype(np.uint8)
    Image.fromarray(dpng).save(os.path.join(out_dir, scan, "depth", f"{name}.png"))
    Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(out_dir, "rgb", scan, f"{name}.jpg")
    )
    np.save(
        os.path.join(out_dir, "depth", scan, f"{name}.npy"),
        {"depth": depth_mm, "extrinsic": extrinsic, "intrinsic": intrinsic},
    )


def extract_geometry_for_dataset(cfg: Config, variables, dataset,
                                 out_dir: Optional[str] = None,
                                 mesh=None, seed: int = 0) -> Dict[str, float]:
    """Render all views of one per-scan dataset and write the depth layout.

    Returns simple timing stats (rays/sec over all views).
    """
    import time

    out_dir = out_dir or cfg.out_dir
    renderer = SceneRenderer(cfg, variables, mesh=mesh)
    key = jax.random.PRNGKey(seed)

    total_rays = 0
    t_start = None
    for i in range(len(dataset)):
        sample = dataset[i]
        scene, extras = scene_inputs_from_sample(sample)
        key, sub = jax.random.split(key)
        out = renderer.render_depth_view(scene, extras, sub)
        if t_start is None:  # skip compile in timing
            t_start = time.perf_counter()
            t_first = t_start
        total_rays += extras["ray_d"].shape[0]

        meta = extras["meta"]
        parts = meta.split("-")
        scan, name = parts[1], parts[-1]
        save_depth_outputs(
            out_dir, scan, name, out["depth"], out["rgb"],
            extras["extrinsic_render_view"], extras["intrinsic_render_view"],
        )
    elapsed = max(time.perf_counter() - (t_start or time.perf_counter()), 1e-9)
    return {"views": len(dataset), "rays": total_rays,
            "rays_per_sec": total_rays / elapsed}
