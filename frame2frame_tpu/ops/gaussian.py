"""Separable Gaussian smoothing matching the reference solver's semantics
(tvl1flow/mask.c:223-339).

Key reference details replicated exactly:
- kernel half-width ``size = int(5 * sigma) + 1`` (mask.c:234), taps
  ``B[i] = exp(-i^2 / (2 sigma^2)) / (sigma sqrt(2 pi))`` normalized by
  ``2*sum(B) - B[0]`` (mask.c:245-255);
- only offsets ``|j| <= size-1`` are summed (mask.c:288-293), so effective pad
  width is ``size - 1``;
- asymmetric reflecting boundary (mask.c:273-277): the left edge mirrors about
  index 0 *excluding* the edge pixel (I[-p] = I[p]) while the right edge mirrors
  *including* it (I[n-1+p] = I[n-p]);
- rows are smoothed first, then columns of the row-smoothed image (in-place in C).

The kernel is built on host in float64; device math runs in the input dtype.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def gaussian_kernel(sigma: float):
    """Half-kernel B[0..size-1] per mask.c:243-255; returns numpy float64."""
    size = int(5 * sigma) + 1
    i = np.arange(size, dtype=np.float64)
    B = np.exp(-(i * i) / (2.0 * sigma * sigma)) / (sigma * np.sqrt(2.0 * np.pi))
    norm = 2.0 * B.sum() - B[0]
    return B / norm


def _reflect_pad_1d(x, m, axis):
    """Pad width ``m`` with the solver's asymmetric reflecting boundary."""
    if m == 0:
        return x

    def take(sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    # left: positions -1..-m map to I[1]..I[m] (mirror about 0, edge excluded)
    left = jnp.flip(take(slice(1, m + 1)), axis=axis)
    # right: positions n..n+m-1 map to I[n-1]..I[n-m] (mirror incl. edge)
    right = jnp.flip(take(slice(-m, None)), axis=axis)
    return jnp.concatenate([left, x, right], axis=axis)


def _conv_sym_1d(x, B, axis):
    """out[i] = B[0]*x[i] + sum_j B[j]*(x[i-j]+x[i+j]), j=1..size-1."""
    size = len(B)
    m = size - 1
    xp = _reflect_pad_1d(x, m, axis)
    n = x.shape[axis]

    def take(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + n)
        return xp[tuple(idx)]

    out = B[0] * take(m)
    for j in range(1, size):
        out = out + B[j] * (take(m - j) + take(m + j))
    return out


def gaussian_smooth(img, sigma):
    """Separable Gaussian blur of (..., H, W) arrays; rows then columns."""
    if sigma <= 0:
        return img
    B = gaussian_kernel(float(sigma))
    Bj = jnp.asarray(B, dtype=img.dtype)
    out = _conv_sym_1d(img, Bj, axis=-1)  # rows pass (along x)
    out = _conv_sym_1d(out, Bj, axis=-2)  # columns pass (along y)
    return out
