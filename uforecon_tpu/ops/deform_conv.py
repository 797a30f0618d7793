"""Deformable convolution v2 for TPU: bilinear taps + masked contraction.

TPU-native replacement for torchvision's C++/CUDA ``deform_conv2d``
(reference: code1/encoder_utils/fmt/dcn.py:15-80, used 9x in the FeatureNet
output heads, fmt/module.py:409-440).

Instead of a scatter/gather kernel, each of the K*K kernel taps bilinearly
samples the input at ``p + p_k + Δp_k`` (one fused gather per tap), the taps
are modulated by a sigmoid mask, and a single einsum contracts taps x channels
against the kernel weights — which XLA maps onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Modulated deformable convolution (stride 1, SAME padding, dilation 1).

    Args:
      x:       (N, H, W, C) input.
      offsets: (N, H, W, K*K, 2) per-tap (dy, dx) offsets in pixels.
      mask:    (N, H, W, K*K) modulation in [0, 1].
      weight:  (K, K, C, Cout) kernel.
      bias:    optional (Cout,).

    Returns:
      (N, H, W, Cout).
    """
    n, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    kk = kh * kw

    # Base sampling locations: output pixel + kernel tap (centered).
    ys = jnp.arange(h, dtype=x.dtype)
    xs = jnp.arange(w, dtype=x.dtype)
    ky = jnp.arange(kh, dtype=x.dtype) - (kh - 1) / 2.0
    kx = jnp.arange(kw, dtype=x.dtype) - (kw - 1) / 2.0
    base_y = ys[:, None, None] + ky[None, None, :, None].repeat(kw, axis=-1).reshape(1, 1, kk)
    base_x = xs[None, :, None] + kx[None, None, None, :].repeat(kh, axis=-2).reshape(1, 1, kk)

    py = base_y[None] + offsets[..., 0]  # (N, H, W, KK)
    px = base_x[None] + offsets[..., 1]

    # Bilinear gather at fractional (py, px), zero padding outside.
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # Corner-packed gathers, tap-by-tap accumulation. Two TPU constraints
    # shape this:
    #   * materializing all KK taps at once as (N, H, W, KK, C) cost 4x
    #     8.8GB of padded HLO temps at 800x640 (v5e OOM);
    #   * gathers must index the second-minor axis with value rows on lanes
    #     (the canonical XLA:TPU gather); packing the 2x2 bilinear corners
    #     into one 4C row makes each tap ONE such gather instead of four.
    # Each tap's sample is contracted against its (C, Cout) weight slice on
    # the MXU before the next tap's gather.
    from .grid_sample import pack_image_corners

    packed = pack_image_corners(x).reshape(n, h * w, 4 * c)
    w_taps = weight.reshape(kk, c, cout)
    hp = jax.lax.Precision.HIGHEST

    def sample_tap(yi, xi, fy, fx):
        y0c = jnp.clip(yi, 0, h - 1)
        x0c = jnp.clip(xi, 0, w - 1)
        # clamped-base weights reproduce zeros padding (see
        # grid_sample_2d_packed): w0 = clip(1-|f|,0,1), w1 = clip(f,0,1)
        # with f measured from the clamped base
        fy = fy + (yi - y0c).astype(x.dtype)
        fx = fx + (xi - x0c).astype(x.dtype)
        wy0 = jnp.clip(1.0 - jnp.abs(fy), 0.0, 1.0)
        wy1 = jnp.clip(fy, 0.0, 1.0)
        wx0 = jnp.clip(1.0 - jnp.abs(fx), 0.0, 1.0)
        wx1 = jnp.clip(fx, 0.0, 1.0)
        idx = (y0c * w + x0c).reshape(n, -1)
        rows = jnp.take_along_axis(packed, idx[..., None], axis=1)  # (N,P,4C)
        out = (rows[..., 0 * c:1 * c] * (wy0 * wx0).reshape(n, -1, 1)
               + rows[..., 1 * c:2 * c] * (wy0 * wx1).reshape(n, -1, 1)
               + rows[..., 2 * c:3 * c] * (wy1 * wx0).reshape(n, -1, 1)
               + rows[..., 3 * c:4 * c] * (wy1 * wx1).reshape(n, -1, 1))
        return out  # (N, P, C)

    out = jnp.zeros((n, h * w, cout), x.dtype)
    for k in range(kk):
        tap = sample_tap(y0i[..., k], x0i[..., k], wy[..., k], wx[..., k])
        tap = tap * mask[..., k].reshape(n, -1, 1)
        out = out + jnp.einsum("npc,co->npo", tap, w_taps[k], precision=hp)

    out = out.reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d_reference(x, offsets, mask, weight, bias=None):
    """Slow numpy loop implementation used as the test golden."""
    n, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    out = np.zeros((n, h, w, cout), dtype=np.float64)
    for b in range(n):
        for oy in range(h):
            for ox in range(w):
                acc = np.zeros(cout)
                t = 0
                for iy in range(kh):
                    for ix in range(kw):
                        py = oy + iy - (kh - 1) / 2 + offsets[b, oy, ox, t, 0]
                        px = ox + ix - (kw - 1) / 2 + offsets[b, oy, ox, t, 1]
                        y0, x0 = int(np.floor(py)), int(np.floor(px))
                        wy, wx = py - y0, px - x0
                        val = np.zeros(c)
                        for dy, dx, ww in (
                            (0, 0, (1 - wy) * (1 - wx)),
                            (0, 1, (1 - wy) * wx),
                            (1, 0, wy * (1 - wx)),
                            (1, 1, wy * wx),
                        ):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < h and 0 <= xx < w:
                                val += ww * x[b, yy, xx]
                        acc += mask[b, oy, ox, t] * val @ weight[iy, ix]
                        t += 1
                out[b, oy, ox] = acc
    if bias is not None:
        out = out + bias
    return out.astype(np.float32)
