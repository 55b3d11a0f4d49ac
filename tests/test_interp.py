"""Bicubic interpolation vs a scalar numpy port of the C sampler
(tvl1flow/bicubic_interpolation.c), including the Neumann out-flag and the
``my`` uses-``sx`` quirk (line 159)."""

import numpy as np
import pytest

from frame2frame_tpu.ops.interp import bicubic_at, bicubic_warp
from frame2frame_tpu.ops.pyramid import zoom_in, zoom_out, zoom_size


def np_cubic(v, x):
    return v[1] + 0.5 * x * (
        v[2] - v[0] + x * (2.0 * v[0] - 5.0 * v[1] + 4.0 * v[2] - v[3]
                           + x * (3.0 * (v[1] - v[2]) + v[3] - v[0]))
    )


def np_bicubic_at(img, uu, vv, border_out):
    ny, nx = img.shape
    sx = -1 if uu < 0 else 1
    sy = -1 if vv < 0 else 1
    out = [False]

    def neumann(x, n):
        if x < 0:
            out[0] = True
            return 0
        if x >= n:
            out[0] = True
            return n - 1
        return x

    x = neumann(int(uu), nx)
    y = neumann(int(vv), ny)
    mx = neumann(int(uu) - sx, nx)
    my = neumann(int(vv) - sx, ny)  # quirk: sx, not sy (line 159)
    dx = neumann(int(uu) + sx, nx)
    dy = neumann(int(vv) + sy, ny)
    ddx = neumann(int(uu) + 2 * sx, nx)
    ddy = neumann(int(vv) + 2 * sy, ny)

    if out[0] and border_out:
        return 0.0
    cols = []
    for ix in (mx, x, dx, ddx):
        vals = [img[my, ix], img[y, ix], img[dy, ix], img[ddy, ix]]
        cols.append(np_cubic(vals, vv - y))
    return np_cubic(cols, uu - x)


@pytest.fixture
def img():
    rng = np.random.default_rng(11)
    return (rng.random((12, 15)) * 255).astype(np.float32)


def test_bicubic_at_interior(img):
    rng = np.random.default_rng(3)
    uu = rng.uniform(2, 12, size=50).astype(np.float32)
    vv = rng.uniform(2, 9, size=50).astype(np.float32)
    got = np.asarray(bicubic_at(img, uu, vv, border_out=False))
    exp = [np_bicubic_at(img, u, v, False) for u, v in zip(uu, vv)]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("border_out", [False, True])
def test_bicubic_at_borders(img, border_out):
    """Stress the boundary band incl. negative coords and the out-flag."""
    rng = np.random.default_rng(4)
    uu = rng.uniform(-3, 18, size=200).astype(np.float32)
    vv = rng.uniform(-3, 15, size=200).astype(np.float32)
    got = np.asarray(bicubic_at(img, uu, vv, border_out=border_out))
    exp = [np_bicubic_at(img, u, v, border_out) for u, v in zip(uu, vv)]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


def test_bicubic_warp_matches_scalar(img):
    rng = np.random.default_rng(5)
    u = rng.normal(scale=2.0, size=img.shape).astype(np.float32)
    v = rng.normal(scale=2.0, size=img.shape).astype(np.float32)
    got = np.asarray(bicubic_warp(img, u, v, border_out=True))
    ny, nx = img.shape
    exp = np.zeros_like(img)
    for i in range(ny):
        for j in range(nx):
            exp[i, j] = np_bicubic_at(img, j + u[i, j], i + v[i, j], True)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


def test_zoom_size_rounding():
    assert zoom_size(11, 7, 0.5) == (6, 4)  # int(n*f + 0.5)
    assert zoom_size(16, 16, 0.5) == (8, 8)


def test_zoom_roundtrip_shape(img):
    nxx, nyy = zoom_size(img.shape[1], img.shape[0], 0.5)
    small = zoom_out(img, 0.5, (nyy, nxx))
    assert small.shape == (nyy, nxx)
    big = zoom_in(np.asarray(small), img.shape)
    assert big.shape == img.shape
    # downsample of a smooth image approximately preserves values
    smooth = np.fromfunction(lambda i, j: i + j, img.shape, dtype=np.float32)
    sm_small = np.asarray(zoom_out(smooth, 0.5, (nyy, nxx)))
    # center of the small image ~ 2x-scaled coordinates of the original ramp
    assert abs(sm_small[2, 2] - (smooth[4, 4])) < 1.0
