"""TV-L1 optical flow (Zach-Pock-Bischof dual formulation) as a single jitted
on-device program.

TPU-native re-design of the reference's CPU/OpenMP solver (tvl1flow/tvl1flow_lib.c):
- the image pyramid has **host-computed static shapes** per level
  (``pyramid_shapes``), so XLA sees only static-shape programs — the counterpart
  of the C code's dynamic per-level allocation (tvl1flow_lib.c:400-414);
- the <=300-iteration primal-dual inner loop (tvl1flow_lib.c:170-256) is a
  ``lax.while_loop`` with an on-device SSD error reduction; under ``vmap`` the
  updates are gated per-element on an ``active`` flag so batched solves keep
  exact per-pair convergence semantics;
- warping uses the exact Keys-bicubic/Neumann sampler (ops/interp.py), gradients
  and divergence the exact border-corrected operators (ops/grad.py).

Defaults mirror tvl1flow/main.c:25-35; the denoising pipeline overrides
lambda=0.2, fscale=2 (tvl1flow/tvl1flow.sh:10-18).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.gaussian import gaussian_smooth
from ..ops.grad import centered_gradient, divergence, forward_gradient
from ..ops.interp import bicubic_warp
from ..ops.pyramid import num_scales, pyramid_shapes, zoom_in, zoom_out

MAX_ITERATIONS = 300
PRESMOOTHING_SIGMA = 0.8
GRAD_IS_ZERO = 1e-10


def _normalize_pair(I0, I1):
    """Joint min-max normalization of both images to [0, 255]
    (tvl1flow_lib.c:314-348)."""
    mn = jnp.minimum(I0.min(), I1.min())
    mx = jnp.maximum(I0.max(), I1.max())
    den = mx - mn
    scale = jnp.where(den > 0, 255.0 / jnp.where(den > 0, den, 1.0), 1.0)
    off = jnp.where(den > 0, mn, 0.0)
    return (I0 - off) * scale, (I1 - off) * scale


def _tvl1_scale(I0, I1, u1, u2, tau, lambda_, theta, warps, epsilon, max_iters,
                use_pallas_inner=False):
    """Single-scale dual TV-L1 solve (tvl1flow_lib.c:96-263).

    The dual variables p persist across the ``warps`` fixed-point updates, as in
    the reference (p initialized once per scale, tvl1flow_lib.c:139-143).

    ``use_pallas_inner``: run the <=300-iteration primal-dual loop inside a
    single VMEM-resident Pallas kernel (flow/tvl1_pallas.py) — same math, no
    per-iteration dispatch latency; used when the scale's state fits VMEM.
    """
    l_t = lambda_ * theta
    taut = tau / theta
    eps2 = epsilon * epsilon
    size = I0.size

    I1x, I1y = centered_gradient(I1)
    zeros = jnp.zeros_like(I0)
    p11 = p12 = p21 = p22 = zeros

    def warp_body(carry, _):
        u1, u2, p11, p12, p21, p22 = carry
        I1w = bicubic_warp(I1, u1, u2, border_out=True)
        I1wx = bicubic_warp(I1x, u1, u2, border_out=True)
        I1wy = bicubic_warp(I1y, u1, u2, border_out=True)
        grad = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u1 - I1wy * u2 - I0

        if use_pallas_inner:
            from .tvl1_pallas import tvl1_inner_loop

            u1, u2, p11, p12, p21, p22 = tvl1_inner_loop(
                I1wx, I1wy, rho_c, grad, u1, u2, p11, p12, p21, p22,
                tau, lambda_, theta, epsilon, max_iters,
            )
            return (u1, u2, p11, p12, p21, p22), None

        def cond(state):
            n, error = state[0], state[1]
            return jnp.logical_and(error > eps2, n < max_iters)

        def body(state):
            n, error, u1, u2, p11, p12, p21, p22 = state
            # per-element convergence gate: exact under vmap where cond
            # becomes "any pair still active" (see module docstring)
            active = jnp.logical_and(error > eps2, n < max_iters)

            # thresholding step for the auxiliary variable v (lib.c:178-212)
            rho = rho_c + I1wx * u1 + I1wy * u2
            safe_grad = jnp.where(grad < GRAD_IS_ZERO, 1.0, grad)
            fi = jnp.where(grad < GRAD_IS_ZERO, 0.0, -rho / safe_grad)
            d1 = jnp.where(
                rho < -l_t * grad,
                l_t * I1wx,
                jnp.where(rho > l_t * grad, -l_t * I1wx, fi * I1wx),
            )
            d2 = jnp.where(
                rho < -l_t * grad,
                l_t * I1wy,
                jnp.where(rho > l_t * grad, -l_t * I1wy, fi * I1wy),
            )
            v1 = u1 + d1
            v2 = u2 + d2

            # primal update u = v + theta * div(p) with SSD error (lib.c:214-234)
            u1n = v1 + theta * divergence(p11, p12)
            u2n = v2 + theta * divergence(p21, p22)
            err = (jnp.sum((u1n - u1) ** 2) + jnp.sum((u2n - u2) ** 2)) / size

            # dual ascent (lib.c:237-256)
            u1x, u1y = forward_gradient(u1n)
            u2x, u2y = forward_gradient(u2n)
            g1 = jnp.sqrt(u1x * u1x + u1y * u1y)
            g2 = jnp.sqrt(u2x * u2x + u2y * u2y)
            ng1 = 1.0 + taut * g1
            ng2 = 1.0 + taut * g2
            p11n = (p11 + taut * u1x) / ng1
            p12n = (p12 + taut * u1y) / ng1
            p21n = (p21 + taut * u2x) / ng2
            p22n = (p22 + taut * u2y) / ng2

            def sel(new, old):
                return jnp.where(active, new, old)

            return (
                n + jnp.where(active, 1, 0),
                jnp.where(active, err, error),
                sel(u1n, u1),
                sel(u2n, u2),
                sel(p11n, p11),
                sel(p12n, p12),
                sel(p21n, p21),
                sel(p22n, p22),
            )

        init = (jnp.int32(0), jnp.asarray(jnp.inf, I0.dtype), u1, u2, p11, p12, p21, p22)
        state = lax.while_loop(cond, body, init)
        _, _, u1, u2, p11, p12, p21, p22 = state
        return (u1, u2, p11, p12, p21, p22), None

    carry = (u1, u2, p11, p12, p21, p22)
    for _ in range(warps):  # static trip count (nwarps, main.c:33)
        carry, _ = warp_body(carry, None)
    u1, u2 = carry[0], carry[1]
    return u1, u2


@lru_cache(maxsize=32)
def make_tvl1_solver(
    nx,
    ny,
    tau=0.25,
    lambda_=0.15,
    theta=0.3,
    nscales=100,
    fscale=0,
    zfactor=0.5,
    warps=5,
    epsilon=0.01,
    max_iters=MAX_ITERATIONS,
    dtype=jnp.float32,
    inner_impl="auto",
):
    """Build a jitted solver ``(I0, I1) -> flow (ny, nx, 2)`` for a fixed size.

    Solvers are cached per (size, params); first call compiles.

    ``inner_impl``: "xla" (lax.while_loop), "pallas" (VMEM-resident kernel for
    scales that fit; bit-identical results), or "auto". Measured on the target
    v5e both run at the same speed (~60us/iteration is intrinsic small-grid
    loop cost, not dispatch), so "auto" currently resolves to "xla".
    """
    nscales = num_scales(nx, ny, nscales, zfactor)
    fscale = min(fscale, nscales)
    shapes = pyramid_shapes(nx, ny, nscales, zfactor)  # [(nx, ny)] finest-first
    if inner_impl == "auto":
        inner_impl = "xla"
    from .tvl1_pallas import vmem_fits

    def solve(I0, I1):
        I0 = I0.astype(dtype)
        I1 = I1.astype(dtype)
        I0n, I1n = _normalize_pair(I0, I1)
        I0n = gaussian_smooth(I0n, PRESMOOTHING_SIGMA)
        I1n = gaussian_smooth(I1n, PRESMOOTHING_SIGMA)

        I0s, I1s = [I0n], [I1n]
        for s in range(1, nscales):
            nxs, nys = shapes[s]
            I0s.append(zoom_out(I0s[-1], zfactor, (nys, nxs)))
            I1s.append(zoom_out(I1s[-1], zfactor, (nys, nxs)))

        nxc, nyc = shapes[nscales - 1]
        u1 = jnp.zeros((nyc, nxc), dtype)
        u2 = jnp.zeros((nyc, nxc), dtype)

        # coarse-to-fine (tvl1flow_lib.c:421-447); scales finer than fscale are
        # reached by upsampling only (lib.c:449-466, fscale>0 per tvl1flow.sh)
        for s in range(nscales - 1, -1, -1):
            if s >= fscale:
                nxs, nys = shapes[s]
                use_pallas = inner_impl == "pallas" and vmem_fits(nys, nxs)
                u1, u2 = _tvl1_scale(
                    I0s[s], I1s[s], u1, u2, tau, lambda_, theta, warps,
                    epsilon, max_iters, use_pallas_inner=use_pallas,
                )
            if s == 0:
                break
            nxf, nyf = shapes[s - 1]
            u1 = zoom_in(u1, (nyf, nxf)) * (1.0 / zfactor)
            u2 = zoom_in(u2, (nyf, nxf)) * (1.0 / zfactor)

        return jnp.stack([u1, u2], axis=-1)

    return jax.jit(solve)


def tvl1_flow(I0, I1, **params):
    """Compute TV-L1 flow from I0 to I1 for a single (H, W) image pair."""
    ny, nx = I0.shape
    solver = make_tvl1_solver(nx, ny, **params)
    return solver(jnp.asarray(I0), jnp.asarray(I1))


# parameters used by the reference denoising pipeline (tvl1flow.sh:10-18)
DENOISING_PARAMS = dict(tau=0.25, lambda_=0.2, theta=0.3, nscales=100, fscale=2,
                        zfactor=0.5, warps=5, epsilon=0.01)


def make_batched_tvl1(nx, ny, **params):
    """vmapped solver over a leading pair axis: (P, ny, nx) x2 -> (P, ny, nx, 2)."""
    base = make_tvl1_solver(nx, ny, **params)
    return jax.jit(jax.vmap(base))
