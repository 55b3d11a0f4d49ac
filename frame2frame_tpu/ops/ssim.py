"""Differentiable SSIM in JAX — the reference's missing ``frame2frame.ssim``
module (imported at stnls_loss.py:384); standard gaussian-window SSIM
(window 11, sigma 1.5, constants K1=0.01 K2=0.03) as in the ubiquitous
pytorch-ssim implementation the harness used.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _gaussian_window_np(window_size: int, sigma: float):
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_window(window_size: int, sigma: float):
    # cache holds host arrays: a jnp constant created while tracing is a
    # tracer, and caching it leaks into later traces (see losses/b2u.py)
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _filter(img, win):
    """Separable depthwise gaussian filter; img (B, H, W, C), SAME padding."""
    B, H, W, C = img.shape
    k = win.shape[0]
    kernel = win.reshape(k, 1, 1, 1)
    x = img.transpose(0, 3, 1, 2).reshape(B * C, H, W, 1)
    x = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(k // 2, k // 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.lax.conv_general_dilated(
        x, kernel.reshape(1, k, 1, 1), (1, 1), [(0, 0), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return x.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def ssim(img1, img2, window_size=11, sigma=1.5, data_range=1.0,
         reduce="mean"):
    """Mean SSIM over a batch; img1/img2: (B, H, W, C). Differentiable.
    ``reduce="image"`` returns per-image means (B,) instead of the scalar
    (equal per-image pixel counts make their mean equal the scalar)."""
    win = _gaussian_window(window_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1 = _filter(img1, win)
    mu2 = _filter(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter(img1 * img1, win) - mu1_sq
    s2 = _filter(img2 * img2, win) - mu2_sq
    s12 = _filter(img1 * img2, win) - mu12
    smap = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    if reduce == "image":
        return jnp.mean(smap, axis=(1, 2, 3))
    return jnp.mean(smap)
