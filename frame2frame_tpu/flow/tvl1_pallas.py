"""Pallas kernel for the TV-L1 primal-dual inner loop.

The multiscale solver's cost on TPU is dominated by *latency*, not compute: the
<=300-iteration inner loop (tvl1flow_lib.c:170-256) runs at tiny pyramid scales
where each iteration touches a few thousand pixels but pays ~60us of
per-iteration op latency under XLA's while-loop. Every solved scale of a 540p
fscale=2 run fits comfortably in VMEM (~2 MB of state), so this kernel keeps
ALL state resident in VMEM and runs the entire while-loop inside one Pallas
program — the per-iteration cost becomes pure VPU work.

The math is identical to flow/tvl1.py `_tvl1_scale`'s inner loop (same ops,
same f32): thresholding v-step, divergence/primal update with SSD error,
forward-gradient dual ascent. The bicubic warps stay outside in XLA (they are
gather-heavy and run only ``nwarps`` times per scale).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRAD_IS_ZERO = 1e-10


def _divergence(v1, v2):
    dx = jnp.concatenate([v1[:, :1], v1[:, 1:-1] - v1[:, :-2], -v1[:, -2:-1]],
                         axis=1)
    dy = jnp.concatenate([v2[:1, :], v2[1:-1, :] - v2[:-2, :], -v2[-2:-1, :]],
                         axis=0)
    return dx + dy


def _forward_gradient(f):
    fx = jnp.concatenate([f[:, 1:] - f[:, :-1], jnp.zeros_like(f[:, :1])],
                         axis=1)
    fy = jnp.concatenate([f[1:, :] - f[:-1, :], jnp.zeros_like(f[:1, :])],
                         axis=0)
    return fx, fy


def _inner_kernel(I1wx_ref, I1wy_ref, rho_c_ref, grad_ref, u1_ref, u2_ref,
                  p11_ref, p12_ref, p21_ref, p22_ref,
                  u1_out, u2_out, p11_out, p12_out, p21_out, p22_out,
                  *, tau, lambda_, theta, epsilon, max_iters, size):
    l_t = lambda_ * theta
    taut = tau / theta
    eps2 = epsilon * epsilon

    I1wx = I1wx_ref[:]
    I1wy = I1wy_ref[:]
    rho_c = rho_c_ref[:]
    grad = grad_ref[:]
    safe_grad = jnp.where(grad < GRAD_IS_ZERO, 1.0, grad)

    def cond(state):
        n, error = state[0], state[1]
        return jnp.logical_and(error > eps2, n < max_iters)

    def body(state):
        n, _, u1, u2, p11, p12, p21, p22 = state
        rho = rho_c + I1wx * u1 + I1wy * u2
        fi = jnp.where(grad < GRAD_IS_ZERO, 0.0, -rho / safe_grad)
        d1 = jnp.where(rho < -l_t * grad, l_t * I1wx,
                       jnp.where(rho > l_t * grad, -l_t * I1wx, fi * I1wx))
        d2 = jnp.where(rho < -l_t * grad, l_t * I1wy,
                       jnp.where(rho > l_t * grad, -l_t * I1wy, fi * I1wy))
        v1 = u1 + d1
        v2 = u2 + d2
        u1n = v1 + theta * _divergence(p11, p12)
        u2n = v2 + theta * _divergence(p21, p22)
        err = (jnp.sum((u1n - u1) ** 2) + jnp.sum((u2n - u2) ** 2)) / size
        u1x, u1y = _forward_gradient(u1n)
        u2x, u2y = _forward_gradient(u2n)
        ng1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
        ng2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
        return (n + 1, err,
                u1n, u2n,
                (p11 + taut * u1x) / ng1, (p12 + taut * u1y) / ng1,
                (p21 + taut * u2x) / ng2, (p22 + taut * u2y) / ng2)

    init = (jnp.int32(0), jnp.asarray(jnp.inf, jnp.float32),
            u1_ref[:], u2_ref[:], p11_ref[:], p12_ref[:], p21_ref[:],
            p22_ref[:])
    state = lax.while_loop(cond, body, init)
    u1_out[:] = state[2]
    u2_out[:] = state[3]
    p11_out[:] = state[4]
    p12_out[:] = state[5]
    p21_out[:] = state[6]
    p22_out[:] = state[7]


def tvl1_inner_loop(I1wx, I1wy, rho_c, grad, u1, u2, p11, p12, p21, p22,
                    tau, lambda_, theta, epsilon, max_iters):
    """Run the primal-dual iteration to convergence, fully VMEM-resident.

    All arrays (ny, nx) float32. Returns (u1, u2, p11, p12, p21, p22).
    Falls back to interpret mode off-TPU.
    """
    ny, nx = u1.shape
    shape = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    kernel = partial(
        _inner_kernel, tau=float(tau), lambda_=float(lambda_),
        theta=float(theta), epsilon=float(epsilon), max_iters=int(max_iters),
        size=float(ny * nx),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * 6,
        in_specs=[vmem] * 10,
        out_specs=(vmem,) * 6,
        interpret=jax.default_backend() != "tpu",
    )(I1wx, I1wy, rho_c, grad, u1, u2, p11, p12, p21, p22)


def vmem_fits(ny, nx, budget_bytes=12 * 1024 * 1024):
    """Whether the inner-loop state (~20 arrays) fits VMEM at this scale."""
    return 20 * ny * nx * 4 <= budget_bytes
