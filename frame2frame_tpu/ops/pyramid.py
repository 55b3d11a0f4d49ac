"""Image pyramid zoom matching tvl1flow/zoom.c.

Shapes are computed on host (``zoom_size``) so every pyramid level has a static
shape under jit — the XLA-friendly counterpart of the reference's dynamic
allocation (tvl1flow_lib.c:400-414).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .gaussian import gaussian_smooth
from .interp import bicubic_at

ZOOM_SIGMA_ZERO = 0.6


def zoom_size(nx, ny, factor):
    """New size after zooming (zoom.c:24-36): round-half-up via +0.5 truncation."""
    return int(nx * factor + 0.5), int(ny * factor + 0.5)


def pyramid_shapes(nx, ny, nscales, zfactor):
    """Static (nx, ny) per scale, finest first (tvl1flow_lib.c:400-414)."""
    shapes = [(nx, ny)]
    for _ in range(1, nscales):
        nxs, nys = zoom_size(shapes[-1][0], shapes[-1][1], zfactor)
        shapes.append((nxs, nys))
    return shapes


def num_scales(nx, ny, nscales, zfactor):
    """Auto-clamp of nscales so the coarsest level is >= 16px (main.c:159-163)."""
    N = 1 + math.log(math.hypot(nx, ny) / 16.0) / math.log(1.0 / zfactor)
    if N < nscales:
        nscales = int(N)
    return max(nscales, 1)


def zoom_out(img, factor, out_shape):
    """Anti-aliased downsample (zoom.c:43-81): Gaussian then bicubic resample.

    ``out_shape`` is (ny_out, nx_out), precomputed on host via :func:`zoom_size`.
    """
    nyy, nxx = out_shape
    sigma = ZOOM_SIGMA_ZERO * math.sqrt(1.0 / (factor * factor) - 1.0)
    Is = gaussian_smooth(img, sigma)
    j2 = jnp.arange(nxx, dtype=img.dtype) / factor
    i2 = jnp.arange(nyy, dtype=img.dtype) / factor
    return bicubic_at(Is, j2[None, :], i2[:, None], border_out=False)


def zoom_in(img, out_shape):
    """Bicubic upsample to an explicit target size (zoom.c:89-115)."""
    ny, nx = img.shape
    nyy, nxx = out_shape
    factorx = nxx / nx
    factory = nyy / ny
    j2 = jnp.arange(nxx, dtype=img.dtype) / factorx
    i2 = jnp.arange(nyy, dtype=img.dtype) / factory
    return bicubic_at(img, j2[None, :], i2[:, None], border_out=False)
