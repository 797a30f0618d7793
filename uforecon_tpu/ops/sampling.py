"""Ray point sampling: stratified coarse + inverse-CDF importance sampling.

TPU-native rewrite of the reference samplers
(reference: code1/encoder_utils/sampler.py:7-108). Pure functions over
(RN,)-batched rays using threefry RNG; the reference's torch.rand jitter is
reproduced statistically (uniform), not bitwise.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_coarse(
    key: Optional[jax.Array],
    ray_o: jnp.ndarray,      # (RN, 3)
    ray_d: jnp.ndarray,      # (RN, 3)
    point_num: int,
    near: Optional[jnp.ndarray] = None,  # (RN,)
    far: Optional[jnp.ndarray] = None,
    sample_radius: float = 1.3,
    jitter: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified uniform z samples in [near, far] (sampler.py:15-50).

    When near/far are absent, samples +-sample_radius around the point of the
    ray closest to the origin. Returns (points (RN, SN, 3), z (RN, SN)).
    """
    if near is None:
        mid = -jnp.sum(ray_o * ray_d, axis=-1)
        near = mid - sample_radius
        far = mid + sample_radius
    t = jnp.linspace(0.0, 1.0, point_num, dtype=ray_o.dtype)  # (SN,)
    span = (far - near)[:, None]
    z = near[:, None] + t[None, :] * span  # (RN, SN)
    if jitter:
        assert key is not None
        interval = 1.0 / (point_num - 1)
        u = jax.random.uniform(key, z.shape, ray_o.dtype) - 0.5
        z = z + u * interval * span
    points = ray_o[:, None] + z[..., None] * ray_d[:, None]
    return points, z


def sample_importance(
    key: jax.Array,
    ray_o: jnp.ndarray,      # (RN, 3)
    ray_d: jnp.ndarray,      # (RN, 3)
    weight: jnp.ndarray,     # (RN, SN) coarse rendering weights
    z_val: jnp.ndarray,      # (RN, SN) coarse z values (sorted)
    point_num: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-CDF sampling of fine points from coarse weights
    (sampler.py:74-108): uniform (not stratified) cdf draws, searchsorted,
    linear interp between bracketing z values, sorted by z.

    Returns (points (RN, PN, 3), z (RN, PN)) sorted along PN.
    """
    rn, sn = z_val.shape
    cdf = jnp.cumsum(weight, axis=1) / (jnp.sum(weight, axis=1, keepdims=True) + 1e-6)
    u = jax.random.uniform(key, (rn, point_num), z_val.dtype)
    u = jnp.clip(u, cdf[:, 0:1], cdf[:, -1:])

    # vectorized searchsorted(side='left'): #{s : cdf[s] < u}. The generic
    # jnp.searchsorted lowers to a sequential while-loop binary search on
    # TPU (~2s/image); with SN=64 bins the dense comparison count is a
    # single (RN, PN, SN) VPU reduction.
    idx = jnp.sum(
        (cdf[:, None, :] < u[:, :, None]).astype(jnp.int32), axis=-1
    )
    idx = jnp.clip(idx, 1, sn - 1)

    # Fetch the bracketing (cdf, z) pairs densely: a one-hot MXU contraction
    # over the SN=64 bins is ~10x cheaper than four scattered row gathers
    # (take_along_axis costs ~10 ns/row regardless of row width; the dense
    # dot is exact — products by 0/1 and single-nonzero sums are exact f32,
    # via the 3-component bf16 split in ops/exact_onehot.py)
    from .exact_onehot import exact_onehot_einsum

    s_iota = jnp.arange(sn)
    oh_right = (s_iota[None, None, :] == idx[..., None]).astype(z_val.dtype)
    oh_left = (s_iota[None, None, :] == (idx - 1)[..., None]).astype(z_val.dtype)
    cz = jnp.stack([cdf, z_val], axis=-1)                     # (RN, SN, 2)
    right = exact_onehot_einsum("rps,rsc->rpc", oh_right, cz)
    left = exact_onehot_einsum("rps,rsc->rpc", oh_left, cz)
    left_cdf, z_left = left[..., 0], left[..., 1]
    right_cdf, z_right = right[..., 0], right[..., 1]

    z = (u - left_cdf) / (right_cdf - left_cdf + 1e-6) * (z_right - z_left) + z_left
    z = jnp.sort(z, axis=1)
    points = ray_o[:, None] + z[..., None] * ray_d[:, None]
    return points, z


# NOTE: the reference's coarse+fine z merge (model.py:466-470) lives inline
# in UFORecon.render_chunk as an argsort + output permutation so the fine
# pass can reuse the coarse per-point features.
