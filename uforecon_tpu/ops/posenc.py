"""Positional encodings (all pure jnp, precomputable where static).

Covers the reference's three encodings:
  * sine 2D image PE for the matching transformer
    (reference: code1/encoder_utils/fmt/position_encoding.py:23-60)
  * NeRF-style frequency encoding for depth / direction conditioning
    (reference: code1/ray_transformer.py:29-83)
  * sinusoidal sample-order encoding along a ray
    (reference: code1/ray_transformer.py:165-173)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sine_image_pe(d_model: int, height: int, width: int) -> np.ndarray:
    """2D sine positional encoding (H, W, C), torch-parity with
    PositionEncodingSine(temp_bug_fix=True).

    Positions are 1-indexed via cumsum-of-ones in the reference, i.e. the
    top-left pixel has position 1 (position_encoding.py:40-41).
    """
    pe = np.zeros((d_model, height, width), dtype=np.float32)
    y_pos = np.arange(1, height + 1, dtype=np.float32)[:, None] * np.ones((1, width), np.float32)
    x_pos = np.ones((height, 1), np.float32) * np.arange(1, width + 1, dtype=np.float32)[None, :]
    div_term = np.exp(
        np.arange(0, d_model // 2, 2, dtype=np.float32)
        * (-np.log(10000.0) / (d_model // 2))
    )[:, None, None]
    pe[0::4] = np.sin(x_pos[None] * div_term)
    pe[1::4] = np.cos(x_pos[None] * div_term)
    pe[2::4] = np.sin(y_pos[None] * div_term)
    pe[3::4] = np.cos(y_pos[None] * div_term)
    return np.transpose(pe, (1, 2, 0))  # (H, W, C) channels-last


def nerf_posenc(x: jnp.ndarray, num_freqs: int, include_input: bool = False,
                freq_factor: float = float(np.pi)) -> jnp.ndarray:
    """NeRF frequency encoding, interleaved (sin, cos) per frequency.

    Matches PositionalEncoding_NeRF (ray_transformer.py:29-73): output dim is
    ``num_freqs * 2 * d_in`` (+ d_in when include_input), ordered
    [sin(f0*x), cos(f0*x), sin(f1*x), ...] per input channel-major layout:
    the reference repeats frequencies along a new axis then flattens as
    (..., 2*num_freqs, d_in) -> (..., 2*num_freqs*d_in).
    """
    freqs = freq_factor * (2.0 ** np.arange(num_freqs, dtype=np.float32))
    freqs = np.repeat(freqs, 2)  # f0 f0 f1 f1 ...
    phases = np.zeros(2 * num_freqs, dtype=np.float32)
    phases[1::2] = np.pi * 0.5
    emb = jnp.sin(x[..., None, :] * freqs[:, None] + phases[:, None])
    emb = emb.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        emb = jnp.concatenate([x, emb], axis=-1)
    return emb


def order_posenc(d_hid: int, n_samples: int) -> np.ndarray:
    """Sinusoidal encoding of the sample index along a ray (SN, d_hid).

    Reference: ray_transformer.py:165-173.
    """
    pos = np.arange(n_samples, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    table = pos / np.power(10000.0, 2 * (j // 2) / d_hid)
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)
