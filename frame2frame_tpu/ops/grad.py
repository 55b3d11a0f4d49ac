"""Gradient / divergence operators with the exact border semantics of the
reference TV-L1 solver (tvl1flow/mask.c:43-215).

All functions take/return 2D arrays shaped (H, W) == (ny, nx); batch with vmap.
These are pure shift/concat ops — they lower to cheap VPU code on TPU and fuse
into the surrounding primal-dual iteration under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def divergence(v1, v2):
    """Backward-difference divergence (mask.c:43-94).

    Border handling decomposes into independent 1D backward-difference operators:
    col 0 keeps v1, col nx-1 contributes -v1[:, nx-2]; same for rows of v2.
    """
    dx = jnp.concatenate(
        [v1[:, :1], v1[:, 1:-1] - v1[:, :-2], -v1[:, -2:-1]], axis=1
    )
    dy = jnp.concatenate(
        [v2[:1, :], v2[1:-1, :] - v2[:-2, :], -v2[-2:-1, :]], axis=0
    )
    return dx + dy


def forward_gradient(f):
    """Forward differences; zero last column (fx) / last row (fy) (mask.c:103-148)."""
    fx = jnp.concatenate([f[:, 1:] - f[:, :-1], jnp.zeros_like(f[:, :1])], axis=1)
    fy = jnp.concatenate([f[1:, :] - f[:-1, :], jnp.zeros_like(f[:1, :])], axis=0)
    return fx, fy


def centered_gradient(f):
    """Centered differences with one-sided halves at borders (mask.c:156-215).

    Equivalent to 0.5 * central difference on an edge-replicated padding.
    """
    fpx = jnp.pad(f, ((0, 0), (1, 1)), mode="edge")
    fpy = jnp.pad(f, ((1, 1), (0, 0)), mode="edge")
    dx = 0.5 * (fpx[:, 2:] - fpx[:, :-2])
    dy = 0.5 * (fpy[2:, :] - fpy[:-2, :])
    return dx, dy
