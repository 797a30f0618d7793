"""Device mesh + ray-axis sharding for rendering and data-parallel training.

The reference is strictly single-GPU (SURVEY.md §2.8); this module is the
TPU-native scaling layer it never had. Design:

  * mesh axis 'rays' — full-image rendering shards the pixel/ray axis across
    chips; the encoder outputs are replicated (they are small: feature maps +
    frustum volumes), so rendering needs NO cross-chip collectives at all and
    scales linearly over ICI.
  * mesh axis 'data' (training) — batch sharding with psum gradient
    all-reduce, expressed by jit-ing the loss over the mesh with NamedSharding
    so XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rays(mesh: Mesh, arr, axis: str = "rays"):
    """Place a (N, ...) ray-major array sharded along the mesh ray axis."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis 0 up to a multiple; returns (padded, original_length)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, mode="edge"), n
