"""Keys bicubic interpolation and dense warping, matching the reference solver
(tvl1flow/bicubic_interpolation.c) sample-for-sample, vectorized over all pixels.

Reference semantics replicated:
- truncation toward zero for the integer cell index ((int) casts, :147-163);
- Neumann boundary (clamp) with an "out" flag that is set if ANY of the 8
  per-axis taps clamps — including the +/-1 and +/-2 neighbors, so a 1-2px band
  inside the image is flagged "out" (:156-163);
- the reference's ``my`` tap uses ``sx`` (not ``sy``) — a quirk of the C code
  (:159) kept for golden parity;
- ``border_out=True`` returns 0 for flagged samples (:197-198), used by the
  solver's image warps; the pyramid zoom passes ``border_out=False`` (zoom.c:76).

The 16 gathers lower to a single batched take on TPU; everything else is VPU math.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cubic(v0, v1, v2, v3, t):
    """Keys cubic kernel, exactly as bicubic_interpolation.c:102-110."""
    return v1 + 0.5 * t * (
        v2 - v0 + t * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3 + t * (3.0 * (v1 - v2) + v3 - v0))
    )


def bicubic_at(img, uu, vv, border_out):
    """Bicubic sample of ``img`` (H, W) at positions (uu, vv) of any broadcastable
    shape; returns samples of that shape.

    uu is the x (column) coordinate, vv the y (row) coordinate.
    """
    ny, nx = img.shape
    dtype = img.dtype
    uu = uu.astype(dtype)
    vv = vv.astype(dtype)

    sx = jnp.where(uu < 0, -1, 1).astype(jnp.int32)
    sy = jnp.where(vv < 0, -1, 1).astype(jnp.int32)
    x = jnp.trunc(uu).astype(jnp.int32)
    y = jnp.trunc(vv).astype(jnp.int32)

    xs = (x - sx, x, x + sx, x + 2 * sx)
    # NB: the first y tap intentionally uses sx (reference quirk, line 159)
    ys = (y - sx, y, y + sy, y + 2 * sy)

    out = jnp.zeros(jnp.broadcast_shapes(uu.shape, vv.shape), dtype=bool)
    xc, yc = [], []
    for t in xs:
        out = out | (t < 0) | (t >= nx)
        xc.append(jnp.clip(t, 0, nx - 1))
    for t in ys:
        out = out | (t < 0) | (t >= ny)
        yc.append(jnp.clip(t, 0, ny - 1))

    flat = img.ravel()

    def at(ix, iy):
        return jnp.take(flat, iy * nx + ix)

    # interpolate along y within each x column, then along x
    fy = vv - y.astype(dtype)
    fx = uu - x.astype(dtype)
    cols = [
        _cubic(at(ix, yc[0]), at(ix, yc[1]), at(ix, yc[2]), at(ix, yc[3]), fy)
        for ix in xc
    ]
    val = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
    if border_out:
        val = jnp.where(out, jnp.zeros_like(val), val)
    return val


def bicubic_warp(img, u, v, border_out=True):
    """Dense bicubic warp: output[i, j] = img(j + u[i,j], i + v[i,j])
    (bicubic_interpolation.c:242-266)."""
    ny, nx = img.shape
    jj = jnp.arange(nx, dtype=img.dtype)[None, :]
    ii = jnp.arange(ny, dtype=img.dtype)[:, None]
    return bicubic_at(img, jj + u, ii + v, border_out)
