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

    # preview only — keep it robust to NaN/inf depths (e.g. random weights)
    dvis = np.nan_to_num(depth_mm, nan=0.0, posinf=0.0, neginf=0.0)
    dmax = max(float(dvis.max()), 1e-6)
    dpng = np.clip((dvis / dmax) * 255, 0, 255).astype(np.uint8)
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

    def save_view(handle, extras):
        out = renderer.finalize_depth_view(handle)
        parts = extras["meta"].split("-")
        scan, name = parts[1], parts[-1]
        save_depth_outputs(
            out_dir, scan, name, out["depth"], out["rgb"],
            extras["extrinsic_render_view"], extras["intrinsic_render_view"],
        )

    # software-pipelined view loop (VERDICT r4 #6): view i+1's data load +
    # encode/render DISPATCH happen before view i's outputs are fetched, so
    # view i's host tail (~10 MB tunnel download + numpy conversion + file
    # writes) overlaps view i+1's device execution
    total_rays = 0
    t_start = None
    pending = None
    for i in range(len(dataset)):
        sample = dataset[i]
        scene, extras = scene_inputs_from_sample(sample)
        key, sub = jax.random.split(key)
        handle = renderer.render_depth_view_async(scene, extras, sub)
        if t_start is None:  # skip compile in timing
            # scalar fetch, not block_until_ready: on the axon tunnel
            # block_until_ready returns before device completion
            float(handle["out"]["depth"][0])
            t_start = time.perf_counter()
        total_rays += extras["ray_d"].shape[0]
        if pending is not None:
            save_view(*pending)
        pending = (handle, extras)
    if pending is not None:
        save_view(*pending)
    elapsed = max(time.perf_counter() - (t_start or time.perf_counter()), 1e-9)
    return {"views": len(dataset), "rays": total_rays,
            "rays_per_sec": total_rays / elapsed}


def extract_similarity_field(cfg: Config, variables, scene,
                             reso: int = 128, chunk: int = 65536,
                             bound: float = 1.0) -> np.ndarray:
    """Mean pairwise-similarity field over a reso^3 grid in [-bound, bound]^3.

    Debug/analysis path (reference model.py:844-911 extract_similarity /
    extract_fields): evaluates the 8-group cosine similarity at every grid
    point, averaged over groups. Use `similarity_mesh` to threshold it.
    """
    import jax.numpy as jnp

    from ..models.uforecon import UFORecon
    from ..models.ray_transformer import query_similarity

    model = UFORecon(cfg)
    nv = int(scene.source_imgs.shape[0])

    enc = jax.jit(
        lambda v, s: model.apply(v, s, method=model.encode)
    )(variables, scene)

    @jax.jit
    def field_chunk(pts):
        sim, _, valid = query_similarity(
            pts[None], scene.source_poses, enc.aug0, enc.aug1, nv,
            n_groups=cfg.cos_n_group)
        mean_sim = jnp.mean(sim[0], axis=-1)
        all_valid = jnp.all(valid[:, 0], axis=0)
        return jnp.where(all_valid, mean_sim, -1.0)

    axis = np.linspace(-bound, bound, reso, dtype=np.float32)
    out = np.empty(reso * reso * reso, np.float32)
    grid = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"),
                    -1).reshape(-1, 3)
    for s in range(0, len(grid), chunk):
        blk = grid[s:s + chunk]
        pad = 0
        if len(blk) < chunk:
            pad = chunk - len(blk)
            blk = np.concatenate([blk, np.zeros((pad, 3), np.float32)])
        vals = np.asarray(field_chunk(jnp.asarray(blk)))
        out[s:s + chunk - pad if pad else s + chunk] = (
            vals[:-pad] if pad else vals)
    return out.reshape(reso, reso, reso)


def similarity_mesh(field: np.ndarray, threshold: float = 0.99,
                    bound: float = 1.0):
    """Marching cubes over the similarity field (mcubes threshold 0.99,
    reference model.py:880); vertices mapped back to [-bound, bound]^3."""
    from ..fusion.marching import marching_cubes

    # surface where similarity crosses the threshold from above
    verts, faces = marching_cubes(-np.asarray(field), level=-threshold)
    if len(verts):
        reso = field.shape[0]
        verts = verts / (reso - 1) * (2 * bound) - bound
    return verts, faces
