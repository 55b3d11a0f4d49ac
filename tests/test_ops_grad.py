"""Gradient/divergence/gaussian ops vs direct numpy ports of the C spec
(tvl1flow/mask.c). The numpy oracles here are loop-level transcriptions of the
documented border behavior, independent of the JAX implementations."""

import numpy as np
import pytest

from frame2frame_tpu.ops.gaussian import gaussian_kernel, gaussian_smooth
from frame2frame_tpu.ops.grad import centered_gradient, divergence, forward_gradient


def np_divergence(v1, v2):
    """mask.c:43-94 transcribed."""
    ny, nx = v1.shape
    div = np.zeros_like(v1)
    for i in range(1, ny - 1):
        for j in range(1, nx - 1):
            div[i, j] = (v1[i, j] - v1[i, j - 1]) + (v2[i, j] - v2[i - 1, j])
    for j in range(1, nx - 1):
        div[0, j] = v1[0, j] - v1[0, j - 1] + v2[0, j]
        div[ny - 1, j] = v1[ny - 1, j] - v1[ny - 1, j - 1] - v2[ny - 2, j]
    for i in range(1, ny - 1):
        div[i, 0] = v1[i, 0] + v2[i, 0] - v2[i - 1, 0]
        div[i, nx - 1] = -v1[i, nx - 2] + v2[i, nx - 1] - v2[i - 1, nx - 1]
    div[0, 0] = v1[0, 0] + v2[0, 0]
    div[0, nx - 1] = -v1[0, nx - 2] + v2[0, nx - 1]
    div[ny - 1, 0] = v1[ny - 1, 0] - v2[ny - 2, 0]
    div[ny - 1, nx - 1] = -v1[ny - 1, nx - 2] - v2[ny - 2, nx - 1]
    return div


def np_forward_gradient(f):
    """mask.c:103-148 transcribed."""
    ny, nx = f.shape
    fx = np.zeros_like(f)
    fy = np.zeros_like(f)
    fx[:, :-1] = f[:, 1:] - f[:, :-1]
    fy[:-1, :] = f[1:, :] - f[:-1, :]
    fx[:, -1] = 0
    fy[-1, :] = 0
    return fx, fy


def np_centered_gradient(f):
    """mask.c:156-215 transcribed."""
    ny, nx = f.shape
    dx = np.zeros_like(f)
    dy = np.zeros_like(f)
    dx[:, 1:-1] = 0.5 * (f[:, 2:] - f[:, :-2])
    dx[:, 0] = 0.5 * (f[:, 1] - f[:, 0])
    dx[:, -1] = 0.5 * (f[:, -1] - f[:, -2])
    dy[1:-1, :] = 0.5 * (f[2:, :] - f[:-2, :])
    dy[0, :] = 0.5 * (f[1, :] - f[0, :])
    dy[-1, :] = 0.5 * (f[-1, :] - f[-2, :])
    return dx, dy


def np_gaussian(I, sigma):
    """mask.c:223-339 transcribed (reflecting boundary, double accumulation)."""
    size = int(5 * sigma) + 1
    den = 2.0 * sigma * sigma
    B = np.array(
        [np.exp(-i * i / den) / (sigma * np.sqrt(2 * 3.1415926)) for i in range(size)]
    )
    norm = 2 * B.sum() - B[0]
    B = B / norm
    I = I.astype(np.float64).copy()
    ydim, xdim = I.shape

    # rows
    for k in range(ydim):
        R = np.zeros(size + xdim + size)
        R[size : size + xdim] = I[k]
        for i in range(size):
            R[i] = I[k, size - i]
            R[size + xdim + i] = I[k, xdim - i - 1]
        out = np.zeros(xdim)
        for i in range(size, size + xdim):
            s = B[0] * R[i]
            for j in range(1, size):
                s += B[j] * (R[i - j] + R[i + j])
            out[i - size] = s
        I[k] = out
    # columns
    for k in range(xdim):
        T = np.zeros(size + ydim + size)
        T[size : size + ydim] = I[:, k]
        for i in range(size):
            T[i] = I[size - i, k]
            T[size + ydim + i] = I[ydim - i - 1, k]
        out = np.zeros(ydim)
        for i in range(size, size + ydim):
            s = B[0] * T[i]
            for j in range(1, size):
                s += B[j] * (T[i - j] + T[i + j])
            out[i - size] = s
        I[:, k] = out
    return I


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_divergence_matches_c(rng):
    v1 = rng.normal(size=(9, 13)).astype(np.float32)
    v2 = rng.normal(size=(9, 13)).astype(np.float32)
    out = np.asarray(divergence(v1, v2))
    np.testing.assert_allclose(out, np_divergence(v1, v2), atol=1e-6)


def test_forward_gradient_matches_c(rng):
    f = rng.normal(size=(8, 11)).astype(np.float32)
    fx, fy = forward_gradient(f)
    ex, ey = np_forward_gradient(f)
    np.testing.assert_allclose(np.asarray(fx), ex, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fy), ey, atol=1e-6)


def test_centered_gradient_matches_c(rng):
    f = rng.normal(size=(10, 7)).astype(np.float32)
    dx, dy = centered_gradient(f)
    ex, ey = np_centered_gradient(f)
    np.testing.assert_allclose(np.asarray(dx), ex, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), ey, atol=1e-6)


@pytest.mark.parametrize("sigma", [0.8, 1.0392304845413263])  # presmooth & zoom sigmas
def test_gaussian_matches_c(rng, sigma):
    img = (rng.random(size=(20, 24)) * 255).astype(np.float32)
    out = np.asarray(gaussian_smooth(img, sigma))
    exp = np_gaussian(img, sigma)
    np.testing.assert_allclose(out, exp, rtol=2e-5, atol=2e-4)


def test_gaussian_kernel_normalization():
    B = gaussian_kernel(0.8)
    assert abs(2 * B.sum() - B[0] - 1.0) < 1e-12
