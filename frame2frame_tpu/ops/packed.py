"""Pair-packed image layout for full-bandwidth 3x3 convs on TPU.

Measured motivation (BASELINE.md): a (..., 64)-channel f32 array occupies
half-empty (8, 128) HBM tiles, so every conv/grad pass over DnCNN's 64-channel
activations streams at ~105 GB/s instead of ~290. Packing two adjacent pixels'
channels into one 128-lane position removes the tax for the *entire* network:

    packed[h, w2, c + 64*p] = x[h, 2*w2 + p, c]        (a free reshape)

A 3x3 SAME conv on the original image becomes a 3x3 VALID conv on the packed
image (width padded by one packed column = two pixels per side) with a
(3, 3, 2*Cin, 2*Cout) kernel assembled from the original (3, 3, Cin, Cout)
weights; half its blocks are zero (2x FLOPs) but every operand is 128-lane, so
the MXU and HBM both run at full width. Measured on the 15-layer DnCNN trunk
at 540p: 126.8 -> 93.6 ms per fwd+bwd iteration (f32), 70.8 ms with bf16 conv
operands.

Derivation of the kernel packing: with the packed input padded by one packed
column each side, output position (h, w2, d + 64q) = y[h, 2*w2 + q, d] needs
input pixels 2*w2 + q + dx - 1 (dx in 0..2), which live at packed column
w2 + dw2, parity p, where 2*dw2 + p = q + dx + 1. Hence

    W2[dy, dw2, c + 64p, d + 64q] = W[dy, 2*dw2 + p - q - 1, c, d]

when the tap index is in [0, 3), else zero. The weight assembly is ordinary
jnp stacking, so autodiff routes dW2 back to dW exactly.

Replaces no reference component 1:1 — this is the TPU-native execution layout
for the models of lib/frame2frame/dncnn/net.py and the online fine-tune hot
loop (blind_denoising.py:216-222).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Measured (round 2, v5e): the pair-packed Pallas dW kernel (ops/conv_dw.py)
# wins on f32 operands but LOSES on bf16 — its odd-row-offset flat-shift
# slices force per-tap sublane relayout copies in Mosaic. The bf16 chain
# therefore defaults to XLA's batch<->feature-swapped conv-dW (measured
# ~1.7 ms/layer at 540p, same as f32 autodiff) unless explicitly re-enabled.
_PALLAS_DW = os.environ.get("F2F_PALLAS_DW", "0") == "1"


def pack_image(x):
    """(..., H, W, C) -> (..., H, W/2, 2C). W must be even. Free reshape."""
    *lead, H, W, C = x.shape
    assert W % 2 == 0, "pair packing requires even width"
    return x.reshape(*lead, H, W // 2, 2 * C)


def unpack_image(x2):
    """(..., H, W2, 2C) -> (..., H, 2*W2, C)."""
    *lead, H, W2, C2 = x2.shape
    return x2.reshape(*lead, H, W2 * 2, C2 // 2)


def pack_kernel(w):
    """(3, 3, Cin, Cout) -> (3, 3, 2Cin, 2Cout) packed conv kernel.

    Differentiable: built from concatenations, so the VJP scatters dW2 blocks
    back onto the original taps.
    """
    kh, kw, Cin, Cout = w.shape
    assert (kh, kw) == (3, 3), "pair packing implemented for 3x3 kernels"
    z = jnp.zeros_like(w[:, 0])  # (3, Cin, Cout)
    W0, W1, W2 = w[:, 0], w[:, 1], w[:, 2]

    def blocks(tl, tr, bl, br):
        # rows = input parity p, cols = output parity q
        top = jnp.concatenate([tl, tr], axis=2)
        bot = jnp.concatenate([bl, br], axis=2)
        return jnp.concatenate([top, bot], axis=1)  # (3, 2Cin, 2Cout)

    # dw2 = 0: only (p=1, q=0) -> dx = 2*0 + 1 - 0 - 1 = 0
    d0 = blocks(z, z, W0, z)
    # dw2 = 1: (0,0)->dx1, (1,0)->dx2, (0,1)->dx0, (1,1)->dx1
    d1 = blocks(W1, W0, W2, W1)
    # dw2 = 2: only (p=0, q=1) -> dx = 4 - 1 - 1 = 2
    d2 = blocks(z, W2, z, z)
    return jnp.stack([d0, d1, d2], axis=1)  # (3, 3, 2Cin, 2Cout)


def conv3x3_packed(x2, w, dtype=None):
    """3x3 SAME conv in packed space.

    x2: (B, H, W2, 2Cin) packed activation; w: (3, 3, Cin, Cout) ORIGINAL
    weights (packed on the fly — cheap, differentiable). Returns packed
    (B, H, W2, 2Cout). ``dtype``: optional compute dtype (e.g. bfloat16) for
    the conv operands; output is cast back to x2.dtype.
    """
    w2 = pack_kernel(w)
    if dtype is not None and x2.dtype != dtype:
        out = lax.conv_general_dilated(
            x2.astype(dtype), w2.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.astype(x2.dtype)
    return lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def unpack_kernel_grad(dw2):
    """Adjoint of ``pack_kernel``: (3, 3, 2Cin, 2Cout) -> (3, 3, Cin, Cout).

    Sums the (dw2, p, q) blocks that ``pack_kernel`` mapped each original tap
    to (tap dx = 2*dw2 + p - q - 1)."""
    C = dw2.shape[2] // 2
    D = dw2.shape[3] // 2
    d0, d1, d2 = dw2[:, 0], dw2[:, 1], dw2[:, 2]
    tap0 = d0[:, C:, :D] + d1[:, :C, D:]
    tap1 = d1[:, :C, :D] + d1[:, C:, D:]
    tap2 = d1[:, C:, :D] + d2[:, :C, D:]
    return jnp.stack([tap0, tap1, tap2], axis=1)


@jax.custom_vjp
def conv3x3_packed_bf16(x2, w):
    """3x3 SAME conv in packed space with an end-to-end bfloat16 data path.

    x2: (B, H, W2, 2Cin) **bfloat16** packed activation; w: (3, 3, Cin, Cout)
    float32 master weights. Returns bfloat16. Forward and dX convs run on
    bf16 operands with bf16 outputs (half the HBM streaming of the f32 path —
    the measured bottleneck of the online fine-tune, BASELINE.md); the weight
    gradient is produced directly in float32 (``preferred_element_type``) via
    a batch<->feature-swapped conv that needs no operand transposes, then
    folded back onto the original taps. TPU execution layout for the
    reference hot loop (blind_denoising.py:216-222).
    """
    w2 = pack_kernel(w).astype(jnp.bfloat16)
    return lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _packed_bf16_fwd(x2, w):
    return conv3x3_packed_bf16(x2, w), (x2, w)


def _packed_bf16_bwd(res, g):
    x2, w = res
    g = g.astype(x2.dtype)  # upstream may hand back an f32 cotangent
    w2 = pack_kernel(w).astype(jnp.bfloat16)
    # dX: SAME conv of the cotangent with the flipped, io-transposed kernel
    w2t = jnp.flip(w2, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx2 = lax.conv_general_dilated(
        g, w2t, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dW: XLA's conv-dW re-streams x and g from HBM once PER TAP (9x traffic;
    # measured ~2.5 ms/layer at 540p — the dominant cost of the online
    # fine-tune step). The pair-packed Pallas kernel (ops/conv_dw.py) streams
    # both operands exactly once and runs the nine tap matmuls from VMEM with
    # f32 accumulation. Unpacking to (H, W, C) is a free reshape. Mosaic
    # requires 128-aligned lane slices, so thin boundary layers (cin/cout not
    # a multiple of 64 — e.g. DnCNN's 1-channel ends, where dW traffic is
    # negligible anyway) fall back to the batch<->feature-swapped XLA conv.
    B, H, W2, C2 = x2.shape
    cin, cout = C2 // 2, g.shape[-1] // 2
    if _PALLAS_DW and cin % 64 == 0 and cout % 64 == 0:
        from .conv_dw import dw_conv3x3_batched

        dw = dw_conv3x3_batched(x2.reshape(B, H, W2 * 2, cin),
                                g.reshape(B, H, W2 * 2, cout))
    else:
        xp = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dw2 = lax.conv_general_dilated(
            xp, g, (1, 1), "VALID",
            dimension_numbers=("CHWN", "IHWO", "HWNC"),
            preferred_element_type=jnp.float32)  # (3, 3, 2Cin, 2Cout) f32
        dw = unpack_kernel_grad(dw2)
    return dx2, dw


conv3x3_packed_bf16.defvjp(_packed_bf16_fwd, _packed_bf16_bwd)


def fold_packed_stats(m2):
    """Per-128-lane stats -> per-channel: average the two parity copies."""
    C = m2.shape[-1] // 2
    return 0.5 * (m2[..., :C] + m2[..., C:])


def tile_packed(v):
    """Per-channel vector -> per-128-lane (duplicate across parities)."""
    return jnp.concatenate([v, v], axis=-1)
