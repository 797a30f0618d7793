"""NeuS volume rendering: SRDF -> alpha compositing.

TPU-native rewrite of the reference VolumeRenderer
(reference: code1/encoder_utils/renderer.py:7-48). Pure function over
(RN, SN) sample batches; the single learnable deviation scalar lives in the
model params (see models/uforecon.py SingleVariance).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def neus_render(
    z_val: jnp.ndarray,     # (RN, SN)
    radiance: jnp.ndarray,  # (RN, SN, 3)
    srdf: jnp.ndarray,      # (RN, SN)
    inv_s: jnp.ndarray,     # scalar: exp(10 * variance_param)
    cos_anneal_ratio: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Alpha compositing of a signed ray distance field.

    Midpoint intervals; prev/next SRDF estimates +-cos*interval/2 with
    iter_cos = -1 at cos_anneal_ratio=1; alpha = clip((p+1e-5)/(c+1e-5));
    transmittance by cumulative product (renderer.py:19-48).
    """
    interval = z_val[:, 1:] - z_val[:, :-1]
    interval = jnp.concatenate(
        [interval[:, :1], interval, interval[:, -1:]], axis=1
    )
    interval = (interval[:, :-1] + interval[:, 1:]) * 0.5

    inv_s = jnp.clip(inv_s, 1e-6, 1e6)
    true_cos = -1.0
    iter_cos = -(
        -true_cos * 0.5 + 0.5 * (1.0 - cos_anneal_ratio) - true_cos * cos_anneal_ratio
    )

    next_srdf = srdf + iter_cos * interval * 0.5
    prev_srdf = srdf - iter_cos * interval * 0.5
    prev_cdf = jax.nn.sigmoid(prev_srdf * inv_s)
    next_cdf = jax.nn.sigmoid(next_srdf * inv_s)

    p = prev_cdf - next_cdf
    c = prev_cdf
    alpha = jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-7], axis=1),
        axis=1,
    )[:, :-1]
    weight = alpha * trans

    rgb = jnp.sum(radiance * weight[..., None], axis=1)
    depth = jnp.sum(weight * z_val, axis=1)
    opacity = jnp.sum(weight, axis=1)
    return {
        "rgb": rgb,
        "depth": depth,
        "opacity": opacity,
        "weight": weight,
        "variance": 1.0 / inv_s,
    }
