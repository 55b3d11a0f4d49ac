"""Flow warping, validity + occlusion masking, and the frame-to-frame loss —
fully fused on device.

Re-implements the reference ``WarpedLoss`` (blind_denoising.py:44-122 and
lib/frame2frame/warped_loss.py:145-237) as pure JAX. The reference's per-iteration
GPU->CPU->GPU round-trip through scipy ``binary_dilation``
(blind_denoising.py:88-112) becomes an on-device morphological OR of shifts, so
the whole loss fuses into one XLA computation with the model fwd/bwd.

Conventions:
- images are (H, W, C) float; flows are (H, W, 2) with ``flow[..., 0] = u`` (x
  displacement) and ``flow[..., 1] = v`` (y displacement), as in .flo files;
- bilinear sampling follows torch ``grid_sample`` with ``align_corners=True``
  (the torch-0.4-era default the reference was written against): the warped
  sample sits at pixel coordinates (x + u, y + v), zero outside the image.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_warp_with_mask(img, flow):
    """Warp ``img`` by ``flow`` and return (warped, validity_mask).

    The validity mask is the bilinear sample of an all-ones image thresholded at
    0.9999 (blind_denoising.py:73-76): 1 where the sample was fully interpolated
    from in-bounds pixels, 0 otherwise.
    """
    H, W, C = img.shape
    dtype = img.dtype
    xx = jnp.arange(W, dtype=dtype)[None, :]
    yy = jnp.arange(H, dtype=dtype)[:, None]
    sx = xx + flow[..., 0]
    sy = yy + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(H * W, C)

    def corner(ix, iy, w):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        vals = jnp.take(flat, idx.ravel(), axis=0).reshape(H, W, C)
        w_in = jnp.where(inb, w, 0.0)
        return vals * w_in[..., None], w_in

    v00, w00 = corner(x0i, y0i, (1 - wx) * (1 - wy))
    v01, w01 = corner(x0i + 1, y0i, wx * (1 - wy))
    v10, w10 = corner(x0i, y0i + 1, (1 - wx) * wy)
    v11, w11 = corner(x0i + 1, y0i + 1, wx * wy)

    warped = v00 + v01 + v10 + v11
    ones_sampled = w00 + w01 + w10 + w11
    mask = jnp.where(ones_sampled < 0.9999, 0.0, 1.0).astype(dtype)
    return warped, mask[..., None] * jnp.ones((1, 1, C), dtype=dtype)


def _dilate_cross(m):
    """Binary dilation with the 3x3 cross structuring element
    (blind_denoising.py:97-103), zero padding — an OR of the 4 axis shifts."""
    up = jnp.pad(m[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(m[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(m[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(m[:, :-1], ((0, 0), (1, 0)))
    return m | up | down | left | right


def occlusion_mask(flow, old_mask, thresh=0.75):
    """Occlusion mask from the flow 'divergence' (blind_denoising.py:81-113).

    The reference computes ``a = d(u)/dy`` (u differenced along rows) and
    ``b = d(v)/dx`` (v differenced along cols), thresholds |a+b| > 0.75, dilates
    with a 3x3 cross, forces the 1px border occluded, then inverts and ANDs with
    the sampling validity mask. Returned mask has shape (H, W, 1) broadcastable
    against (H, W, C).
    """
    u = flow[..., 0]
    v = flow[..., 1]
    a = jnp.zeros_like(u).at[:-1, :].set(u[1:, :] - u[:-1, :])
    b = jnp.zeros_like(v).at[:, :-1].set(v[:, 1:] - v[:, :-1])
    occ = jnp.abs(a + b) > thresh
    occ = _dilate_cross(occ)
    occ = occ.at[0, :].set(True)
    occ = occ.at[-1, :].set(True)
    occ = occ.at[:, 0].set(True)
    occ = occ.at[:, -1].set(True)
    good = (~occ).astype(flow.dtype)[..., None]
    return old_mask * good


def warped_l1_loss(deno, prev, flow):
    """The frame-to-frame loss: summed L1 between the masked denoised current
    frame and the masked flow-warped previous frame (blind_denoising.py:115-122,
    L1Loss(size_average=False))."""
    warped, mask = bilinear_warp_with_mask(prev, flow)
    mask = occlusion_mask(flow, mask)
    return jnp.sum(jnp.abs(mask * deno - mask * warped))


def warped_dist_loss(deno, prev, flow, dist_crit="l2", in_mask=None):
    """Harness-generalized warped loss (warped_loss.py:213-248): mean charbonnier
    L1 (sqrt(d^2 + 1e-6)) or mean L2 of the masked warped difference."""
    warped, mask = bilinear_warp_with_mask(prev, flow)
    mask = occlusion_mask(flow, mask)
    if in_mask is not None:
        mask = mask * in_mask
    d2 = (mask * deno - mask * warped) ** 2
    if dist_crit == "l1":
        return jnp.mean(jnp.sqrt(d2 + 1e-6))
    elif dist_crit == "l2":
        return jnp.mean(d2)
    raise ValueError(f"Unknown criterion [{dist_crit}]")
