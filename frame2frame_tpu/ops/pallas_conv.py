"""Pallas TPU kernels for the DnCNN hot op: 3x3 same-padding conv with a
custom VJP whose backward passes are MXU matmuls.

Motivation (measured on the target chip, see BASELINE.md): XLA's autodiff
conv-backward for batch-1 NHWC 64-channel convs sustains only ~8-16 TFLOPs
while the chip peaks at ~139; the 20-iteration online fine-tune
(blind_denoising.py:216-222) is therefore backward-bound. These kernels keep
the 3x3 tap structure as 9 accumulated (M, C) @ (C, C) MXU matmuls per row
tile with inputs staged in VMEM:

- forward:  y[m, :] = sum_taps x_shift[m, :] @ W[tap]      (per row tile)
- dX: same kernel with the spatially-flipped, channel-transposed kernel
- dW[tap] = x_shift^T @ dy   — 9 tall-K matmuls accumulated across row tiles
  via a revisited output block (grid-carried accumulation)

Layout: x (B, H, W, C) float32; w (3, 3, Cin, Cout) HWIO (flax Conv layout).
The row tile height is chosen so all staged buffers fit VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    import jax

    return jax.default_backend() != "tpu"


def _pick_tile_h(H, W, C, budget_bytes=8 * 1024 * 1024):
    """Rows per tile so (tile+2, W+2, C) x few buffers stays in VMEM."""
    for th in (16, 8, 4, 2, 1):
        if H % th == 0:
            bytes_needed = 4 * (th + 2) * (W + 2) * C * 3
            if bytes_needed <= budget_bytes:
                return th
    return 1


def _overlap_tiles(xp, H, TH):
    """(H+2, Wp, C) -> (H//TH, TH+2, Wp, C) overlapping row tiles.

    XLA lowers this gather of contiguous row slabs to cheap copies; it buys us
    block-aligned Pallas reads without halo DMA plumbing.
    """
    n = H // TH
    idx = jnp.arange(n) * TH
    return jax.vmap(
        lambda s: lax.dynamic_slice_in_dim(xp, s, TH + 2, axis=0)
    )(idx)


def _fwd_kernel_tiled(xt_ref, w_ref, out_ref, *, TH, W, C, Cout):
    """xt_ref: (1, TH+2, Wp, C) pre-tiled block; out (1, TH, W, Cout)."""
    acc = jnp.zeros((TH * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xt_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, C)
            acc = acc + jnp.dot(xs, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(TH, W, Cout)


def _dw_kernel(xt_ref, dy_ref, dw_ref, *, TH, W, C, Cout):
    """Accumulate dW across row tiles: dw_ref (9*C, Cout) revisited block."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    g = dy_ref[0].reshape(TH * W, Cout)
    for dy in range(3):
        for dx in range(3):
            xs = xt_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, C)
            contrib = lax.dot_general(
                xs, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, Cout)
            t = dy * 3 + dx
            dw_ref[t * C : (t + 1) * C, :] += contrib


def conv3x3_nopad(xp, w):
    """Core: padded input (H+2, W+2, C) + HWIO w (3,3,C,Cout) -> (H, W, Cout)."""
    Hp, Wp, C = xp.shape
    H, W = Hp - 2, Wp - 2
    Cout = w.shape[-1]
    TH = _pick_tile_h(H, W, C)
    w9 = w.reshape(9, C, Cout)
    xt = _overlap_tiles(xp, H, TH)  # (n, TH+2, Wp, C)
    n = H // TH
    out = pl.pallas_call(
        partial(_fwd_kernel_tiled, TH=TH, W=W, C=C, Cout=Cout),
        out_shape=jax.ShapeDtypeStruct((n, TH, W, Cout), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, TH + 2, Wp, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xt, w9)
    return out.reshape(H, W, Cout)


def _dw_nopad(xp, dy):
    """dW for one image: padded x (H+2, W+2, C), dy (H, W, Cout) -> w grad
    (3, 3, C, Cout)."""
    Hp, Wp, C = xp.shape
    H, W = Hp - 2, Wp - 2
    Cout = dy.shape[-1]
    TH = _pick_tile_h(H, W, C)
    n = H // TH
    xt = _overlap_tiles(xp, H, TH)
    dyt = dy.reshape(n, TH, W, Cout)
    dw = pl.pallas_call(
        partial(_dw_kernel, TH=TH, W=W, C=C, Cout=Cout),
        out_shape=jax.ShapeDtypeStruct((9 * C, Cout), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, TH + 2, Wp, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, Cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * C, Cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xt, dyt)
    return dw.reshape(3, 3, C, Cout)


@jax.custom_vjp
def conv3x3(x, w):
    """3x3 SAME conv, NHWC x (B, H, W, C) + HWIO w -> (B, H, W, Cout)."""
    return _conv_fwd_impl(x, w)


def _conv_fwd_impl(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.vmap(lambda a: conv3x3_nopad(a, w))(xp)


def _conv_fwd(x, w):
    return _conv_fwd_impl(x, w), (x, w)


def _conv_bwd(res, g):
    x, w = res
    # dX: conv of g with spatially-flipped, channel-transposed kernel
    wT = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = jax.vmap(lambda a: conv3x3_nopad(a, wT))(gp)
    # dW: accumulate over batch
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.vmap(_dw_nopad)(xp, g).sum(axis=0)
    return dx, dw


conv3x3.defvjp(_conv_fwd, _conv_bwd)


def _xla_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.custom_vjp
def conv3x3_hybrid(x, w):
    """XLA forward + flipped-kernel XLA dX + Pallas dW — the fastest measured
    combination for the batch-1 finetune workload."""
    return _xla_conv(x, w)


def _hybrid_fwd(x, w):
    return _xla_conv(x, w), (x, w)


def _hybrid_bwd(res, g):
    x, w = res
    wT = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _xla_conv(g, wT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.vmap(_dw_nopad)(xp, g).sum(axis=0)
    return dx, dw


conv3x3_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


# ---------------------------------------------------------------------------
# bf16-residual conv: identical forward; the saved activation residual is
# stored in bfloat16 so the dW reduction streams half the bytes. On TPU the
# MXU multiplies f32 operands in bf16 passes anyway (default matmul
# precision), so this changes only memory traffic, not the multiply precision.
# Measured motivation (BASELINE.md): the 16 per-layer dW tall reductions are
# the online-finetune bottleneck (6.25 ms each, streaming-bound).
# ---------------------------------------------------------------------------


@jax.custom_vjp
def conv3x3_bf16res(x, w):
    return _xla_conv(x, w)


def _bf16res_fwd(x, w):
    return _xla_conv(x, w), (x.astype(jnp.bfloat16), w)


def _bf16res_bwd(res, g):
    xb, w = res
    wT = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _xla_conv(g, wT)
    gb = g.astype(jnp.bfloat16)
    # dW = correlation of x with g: 9 shifted tall matmuls on bf16 operands,
    # f32 accumulation
    B, H, W, C = xb.shape
    Cout = g.shape[-1]
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gflat = gb.reshape(-1, Cout)
    taps = []
    for dy in range(3):
        row = []
        for dx_ in range(3):
            xs = xp[:, dy : dy + H, dx_ : dx_ + W, :].reshape(-1, C)
            row.append(
                jnp.einsum("mc,md->cd", xs, gflat,
                           preferred_element_type=jnp.float32)
            )
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps)  # (3, 3, C, Cout)
    return dx, dw


conv3x3_bf16res.defvjp(_bf16res_fwd, _bf16res_bwd)


class PallasConv3x3:
    """flax-compatible functional wrapper used by models.dncnn when
    ``use_pallas_conv`` is set."""

    @staticmethod
    def apply(x, kernel):
        return conv3x3(x, kernel)


# ---------------------------------------------------------------------------
# v2 kernels: im2col patches built in VMEM -> one (M, 9C) @ (9C, Cout) matmul.
# K = 9C = 576 fills the MXU reduction depth (4.5 x 128 lanes) instead of the
# half-empty K = 64 of the 9-matmul form; patches never touch HBM (unlike
# XLA's im2col rewrite, measured 2x slower than lax.conv because of HBM
# round-trips).
# ---------------------------------------------------------------------------


def _pick_tile_h2(H, W, C, budget_bytes=9 * 1024 * 1024):
    for th in (8, 4, 2, 1):
        if H % th == 0 and 4 * th * W * 9 * C <= budget_bytes:
            return th
    return 1


def _fwd_kernel_p2(xt_ref, w_ref, out_ref, *, TH, W, C, Cout):
    """xt (1, TH+2, Wp, C); w (9*C, Cout); out (1, TH, W, Cout)."""
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(xt_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, C))
    patches = jnp.concatenate(cols, axis=1)  # (TH*W, 9C)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(TH, W, Cout)


def _dw_kernel_p2(xt_ref, dy_ref, dw_ref, *, TH, W, C, Cout):
    i = pl.program_id(0)
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(xt_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, C))
    patches = jnp.concatenate(cols, axis=1)  # (TH*W, 9C)
    g = dy_ref[0].reshape(TH * W, Cout)
    contrib = lax.dot_general(
        patches, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (9C, Cout)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = contrib

    @pl.when(i != 0)
    def _():
        dw_ref[:] += contrib


def conv3x3_nopad_p2(xp, w):
    Hp, Wp, C = xp.shape
    H, W = Hp - 2, Wp - 2
    Cout = w.shape[-1]
    TH = _pick_tile_h2(H, W, C)
    w9 = w.reshape(9 * C, Cout)
    xt = _overlap_tiles(xp, H, TH)
    n = H // TH
    out = pl.pallas_call(
        partial(_fwd_kernel_p2, TH=TH, W=W, C=C, Cout=Cout),
        out_shape=jax.ShapeDtypeStruct((n, TH, W, Cout), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, TH + 2, Wp, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xt, w9)
    return out.reshape(H, W, Cout)


def _dw_nopad_p2(xp, dy):
    Hp, Wp, C = xp.shape
    H, W = Hp - 2, Wp - 2
    Cout = dy.shape[-1]
    TH = _pick_tile_h2(H, W, C)
    n = H // TH
    xt = _overlap_tiles(xp, H, TH)
    dyt = dy.reshape(n, TH, W, Cout)
    dw = pl.pallas_call(
        partial(_dw_kernel_p2, TH=TH, W=W, C=C, Cout=Cout),
        out_shape=jax.ShapeDtypeStruct((9 * C, Cout), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, TH + 2, Wp, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, Cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * C, Cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xt, dyt)
    return dw.reshape(3, 3, C, Cout)


@jax.custom_vjp
def conv3x3_p2(x, w):
    """3x3 SAME conv with the im2col-in-VMEM kernels for fwd, dX and dW."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.vmap(lambda a: conv3x3_nopad_p2(a, w))(xp)


def _p2_fwd(x, w):
    return conv3x3_p2(x, w), (x, w)


def _p2_bwd(res, g):
    x, w = res
    wT = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = jax.vmap(lambda a: conv3x3_nopad_p2(a, wT))(gp)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.vmap(_dw_nopad_p2)(xp, g).sum(axis=0)
    return dx, dw


conv3x3_p2.defvjp(_p2_fwd, _p2_bwd)
