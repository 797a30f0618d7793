"""Image quality metrics: PSNR / SSIM in JAX, LPIPS gated on availability.

Replaces the reference's `code1/misc/metrics.py` EvalTools (PSNR/SSIM/LPIPS
via piq + lpips, reference metrics.py:10-65) and the `piq.psnr` call in
validation (reference model.py:711-712). PSNR and SSIM are pure-JAX and
jittable; LPIPS needs pretrained VGG weights (lpips package absent from this
environment) and degrades to None.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over all pixels (piq.psnr semantics)."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Structural similarity over (H, W, C) images — standard Wang et al.
    formulation with an 11x11 gaussian window, matching piq/skimage defaults.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if x.ndim == 2:
        x = x[..., None]
        y = y[..., None]

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # (K,K,1,1)

    def filt(img):
        # depthwise valid conv per channel: (H,W,C) -> (H',W',C)
        img4 = img.transpose(2, 0, 1)[:, None]      # (C,1,H,W)
        out = jax.lax.conv_general_dilated(
            img4, win.transpose(2, 3, 0, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out[:, 0].transpose(1, 2, 0)

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x ** 2
    syy = filt(y * y) - mu_y ** 2
    sxy = filt(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
    return jnp.mean(num / den)


def lpips(pred: np.ndarray, target: np.ndarray) -> Optional[float]:
    """LPIPS perceptual distance; returns None when the lpips package (and
    its pretrained VGG) is unavailable, as in this environment."""
    try:
        import torch
        import lpips as _lpips  # noqa: F401
    except Exception:
        return None
    loss_fn = _lpips.LPIPS(net="vgg")
    to_t = lambda a: torch.from_numpy(
        np.asarray(a, np.float32).transpose(2, 0, 1)[None] * 2 - 1
    )
    with torch.no_grad():
        return float(loss_fn(to_t(pred), to_t(target)).item())


class EvalTools:
    """Aggregate PSNR/SSIM/LPIPS for a batch of image pairs
    (reference misc/metrics.py:10-65 API)."""

    def __init__(self):
        self._psnr = jax.jit(psnr)
        self._ssim = jax.jit(ssim)

    def set_inputs(self, pred: np.ndarray, target: np.ndarray):
        self.pred = np.asarray(pred, np.float32)
        self.target = np.asarray(target, np.float32)
        return self

    def get_metrics(self):
        out = {
            "psnr": float(self._psnr(self.pred, self.target)),
            "ssim": float(self._ssim(self.pred, self.target)),
        }
        lp = lpips(self.pred, self.target)
        if lp is not None:
            out["lpips"] = lp
        return out
