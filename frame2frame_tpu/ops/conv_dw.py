"""Pallas TPU kernel for the 3x3-conv weight gradient at full HBM bandwidth.

Why this exists (measured, BASELINE.md): XLA's conv-dW for batch-1 NHWC
64-channel operands streams at ~42 GB/s because a (..., 64)-channel array is
physically laid out with half-empty (8, 128) HBM tiles; the 16 per-layer dW
reductions cost ~100 ms of the 137 ms online fine-tune step
(blind_denoising.py:216-222 is the reference hot loop).

Design: view the zero-padded activations and output-grads as (m/2, 128)
"pair-packed" arrays — a FREE row-major reshape that fills all 128 lanes, so
HBM reads run at ~290 GB/s instead of ~105/42. In pair-packed space,

    P_r[c + 64p, d + 64q] = sum_j X2[j + r, c + 64p] * G2[j, d + 64q]
                          = sum_m x[m + 2r + p - q, c] * g[m, d]

i.e. one full 128x128 MXU product yields the flat-shift correlations
s = 2r-1, 2r, 2r+1 in its four 64x64 blocks. A 3x3 SAME conv's taps are the
flat shifts s = dy*Wp + dx - 1 (Wp = W + 2, padded row stride), so NINE
matmuls at r in {dy*Wp/2 - 1, dy*Wp/2, dy*Wp/2 + 1} cover all taps with
full-lane operands and in-VMEM read sharing (x and g stream exactly once).

Wrap-around terms at row ends multiply the zero pad columns of g, so they
vanish; cross-row tap reads land in the padded x rows, which are real pad
zeros. The kernel tiles over image rows, accumulating the nine (Cx2, Cg2)
products in a revisited output block; the tap blocks are extracted by the
host wrapper afterwards.

Supports Cin/Cout in {1, 64} (any even-lane-product channel count): the
pair-packed lane width is 2*C, so DnCNN's 1->64, 64->64 and 64->1 convs all
route through the same kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _pick_tile_h(Wp, cx2, cg2, itemsize=4, budget=10 * 1024 * 1024):
    """Rows per tile. TH must be a multiple of 8 so the g2 block row count
    n2 = TH*Wp/2 is sublane-aligned (Wp/2 may be odd); the image is padded
    with zero rows up to a TH multiple. g2 tiles are double-buffered by the
    grid pipeline; the x2 slab (n2 + Wp + 16, cx2) is a single manual DMA."""
    for th in (32, 16, 8):
        n2 = th * Wp // 2
        bytes_needed = itemsize * (2 * n2 * cg2 + (n2 + Wp + 16) * cx2)
        if bytes_needed <= budget:
            return th
    return 8


def _dw_kernel(x2_hbm, g2_ref, out_ref, x2_vmem, sem, *, TH, Wp, r_list):
    i = pl.program_id(0)
    n2 = TH * Wp // 2
    slab = x2_vmem.shape[0]
    # x2_hbm has a 1-row zero prefix: physical row = logical j-row + 1.
    # This tile needs logical rows [i*n2 - 1, i*n2 + n2 + Wp + 1].
    cp = pltpu.make_async_copy(
        x2_hbm.at[pl.ds(i * n2, slab)], x2_vmem, sem)
    cp.start()

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cp.wait()
    g = g2_ref[:]
    for k, r in enumerate(r_list):
        # logical rows [i*n2 + r, +n2) -> slab index r + 1
        xs = x2_vmem[pl.ds(r + 1, n2), :]
        p = lax.dot_general(
            xs, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[k, :, :] += p


def _pack2(a):
    """(R, W, C) -> zero-col-padded, pair-packed (R*(W+2)*C/128-ish, 2C)."""
    R, W, C = a.shape
    ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))
    return ap.reshape(R * (W + 2) // 2, 2 * C)


def dw_conv3x3(x, g):
    """Weight gradient of a 3x3 SAME conv for one image.

    x: (H, W, Cin) f32 conv input; g: (H, W, Cout) f32 output cotangent.
    Returns dW (3, 3, Cin, Cout) f32. Requires W even (pads make the packed
    row stride even) and H divisible by a small tile height.
    """
    H, W, Cin = x.shape
    Cout = g.shape[-1]
    assert g.shape[:2] == (H, W), (x.shape, g.shape)
    assert W % 2 == 0, "pair packing needs an even padded row stride"
    Wp = W + 2
    cx2, cg2 = 2 * Cin, 2 * Cout

    TH = _pick_tile_h(Wp, cx2, cg2, itemsize=x.dtype.itemsize)
    Hpad = -(-H // TH) * TH  # zero-row padding contributes nothing to dW

    # x: pad rows AND cols, pack; prepend one zero j-row (for r = -1) and
    # trailing zero rows so every tile's slab read stays in bounds.
    xp = jnp.pad(x, ((1, 1 + (Hpad - H)), (1, 1), (0, 0)))
    x2 = xp.reshape((Hpad + 2) * Wp // 2, cx2)
    # trailing pad must cover the worst-case slab over-read (slab is rounded
    # up to the sublane alignment, 16 rows for 2-byte dtypes)
    x2 = jnp.concatenate(
        [jnp.zeros((1, cx2), x2.dtype), x2, jnp.zeros((32, cx2), x2.dtype)], 0)
    gp = jnp.pad(g, ((0, Hpad - H), (0, 0), (0, 0)))
    g2 = _pack2(gp)  # (Hpad*Wp/2, cg2), zero pad cols

    n2 = TH * Wp // 2
    n_tiles = Hpad // TH
    align = 16 if x.dtype.itemsize < 4 else 8
    slab = -(-(n2 + Wp + align) // align) * align
    R1 = Wp // 2
    r_list = tuple(
        dy * R1 + dr for dy in range(3) for dr in (-1, 0, 1))

    out = pl.pallas_call(
        partial(_dw_kernel, TH=TH, Wp=Wp, r_list=r_list),
        out_shape=jax.ShapeDtypeStruct((9, cx2, cg2), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n2, cg2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cx2, cg2), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab, cx2), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(x2, g2)

    # Combine the four 64x64 (Cin x Cout) blocks of each P_r into taps.
    # P_r blocks: (p, q) covers flat shift s = 2r + p - q over m-parity q.
    C, D = Cin, Cout
    P = out  # (9, 2C, 2D); index dy*3 + {0: r=R-1, 1: r=R, 2: r=R+1}
    taps = []
    for dy in range(3):
        Pm, P0, Pp = P[dy * 3], P[dy * 3 + 1], P[dy * 3 + 2]
        tap0 = Pm[C:, :D] + P0[:C, D:]      # s = dyWp - 1: (1,0)@R-1 + (0,1)@R
        tap1 = P0[:C, :D] + P0[C:, D:]      # s = dyWp:     (0,0)@R + (1,1)@R
        tap2 = P0[C:, :D] + Pp[:C, D:]      # s = dyWp + 1: (1,0)@R + (0,1)@R+1
        taps.append(jnp.stack([tap0, tap1, tap2]))
    return jnp.stack(taps)  # (3, 3, Cin, Cout)


def dw_conv3x3_batched(x, g):
    """Batched dW: (B, H, W, Cin) x (B, H, W, Cout) -> (3, 3, Cin, Cout)."""
    if x.ndim == 3:
        return dw_conv3x3(x, g)
    B = x.shape[0]
    dw = dw_conv3x3(x[0], g[0])
    for b in range(1, B):
        dw = dw + dw_conv3x3(x[b], g[b])
    return dw


def _xla_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3_dwflat(x, w):
    """3x3 SAME conv: XLA forward and dX, pair-packed Pallas dW.

    The fastest measured combination for the batch-1 online fine-tune: XLA's
    fwd/dX convs are adequate (~40 TFLOPs in context) but its dW is
    streaming-bound at ~42 GB/s; this kernel's dW streams at full rate.
    """
    return _xla_conv(x, w)


def _dwflat_fwd(x, w):
    return _xla_conv(x, w), (x, w)


def _dwflat_bwd(res, g):
    x, w = res
    wT = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _xla_conv(g, wT)
    dw = dw_conv3x3_batched(x, g)
    return dx, dw


conv3x3_dwflat.defvjp(_dwflat_fwd, _dwflat_bwd)
