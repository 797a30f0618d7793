"""Sample dict -> device-ready SceneInputs + host render extras.

The sample dict is the reference-compatible inter-layer contract
(SURVEY.md contract #1, reference dtu_train.py:442-497). This converter
slices it by ``start_idx`` (0 at test: the reference view is part of the
source set; 1 at train: sources exclude it — reference model.py:313) and
packs the device tensors.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.uforecon import SceneInputs


def scene_inputs_from_sample(sample: Dict) -> Tuple[SceneInputs, Dict]:
    s_idx = int(sample.get("start_idx", 1))

    poses = np.asarray(sample["source_poses"])
    poses_inv = np.asarray(sample["source_poses_inv"])
    w2cs = np.asarray(sample["w2cs"])[s_idx:]
    near_fars = np.asarray(sample["near_fars"])

    scene = SceneInputs(
        source_imgs=jnp.asarray(sample["source_imgs"]),
        source_poses=jnp.asarray(poses),
        src_cam_pos=jnp.asarray(poses_inv[:, :3, -1]),
        ref_cam_pos=jnp.asarray(np.asarray(sample["ref_pose_inv"])[:3, -1]),
        src_w2cs=jnp.asarray(w2cs),
        near=jnp.float32(near_fars[0, 0]),
        far=jnp.float32(near_fars[0, 1]),
        ray_o=jnp.asarray(sample["ray_o"]),
        proj_matrices={k: jnp.asarray(v) for k, v in sample["proj_matrices"].items()},
        depth_values=jnp.asarray(sample["depth_values_org_scale"]),
        scale_factor=jnp.float32(sample["scale_factor"]),
    )
    extras = {
        "ray_d": np.asarray(sample["ray_d"]),          # (H*W, 3)
        "cam_ray_d": np.asarray(sample["cam_ray_d"]),  # (H*W, 3)
        "scale_mat": np.asarray(sample["scale_mat"]),
        "meta": sample.get("meta", ""),
        "hw": np.asarray(sample["ref_img"]).shape[:2],
        "ref_img": np.asarray(sample["ref_img"]),
        "extrinsic_render_view": np.asarray(
            sample.get("extrinsic_render_view", sample["w2cs"][0])
        ),
        "intrinsic_render_view": np.asarray(
            sample.get("intrinsic_render_view", sample["intrinsics"][0])
        ),
        "depths_h": np.asarray(sample["depths_h"]) if "depths_h" in sample else None,
        "depths_mm": np.asarray(sample["depths_mm"]) if "depths_mm" in sample else None,
        "near_fars": near_fars,
    }
    return scene, extras
