"""Fused Pallas training pipeline for the DnCNN mid-stack (conv+BN+ReLU)^L.

Why this exists (measured, round 2): with XLA convs the 540p online fine-tune
iteration costs ~59 ms, of which only ~22 ms is convolution math — the other
~35 ms is elementwise/layout traffic XLA emits around the convs (pad+ReLU
fusions, ReLU-mask selects, BN-stat reductions, 5D layout copies; see the
trace accounting in BASELINE.md). This module owns the whole layer pipeline
in two Pallas kernels per layer so every elementwise op rides along with the
matmuls:

- **forward**: one kernel per layer reads the previous layer's raw conv
  output ``z`` once, applies the previous BN affine + ReLU in VMEM, runs the
  nine flat-shift matmuls of the pair-packed 3x3 conv (ops/packed.py layout),
  writes ``z_i`` and accumulates per-channel (sum, sum-of-squares) for the
  BN statistics — padding, BN, ReLU and stats all fused into one HBM pass.
- **backward**: one kernel per layer reads (g_i, z_i, z_{i-1}), reconstructs
  the ReLU mask and normalized activations in VMEM, forms dz (using the
  pre-reduced per-channel BN reductions), computes dX (nine shifted matmuls
  against the io-transposed kernel), dW (nine space-contractions, accumulated
  in a revisited f32 block across tiles), and the *next* layer's BN backward
  reductions in its epilogue — one pass per layer instead of XLA's ~six.

Activation layout: flat pair-packed ``((T+2)*n, 128)`` bf16, where each image
row occupies ``wpad = W2 + 2`` flat positions (W2 packed pairs + 1 zero pad
pair each side) and ``n = tile_h * wpad``. One full zero tile is kept at the
head and tail so every halo DMA ([i*n - off, i*n - off + n + 2*off)) is
in-bounds and 16-row aligned; compute tiles mask invalid (pad) positions with
a static column mask (tile starts are = 0 mod wpad, so the mask is
tile-invariant) and a dynamic row-validity window. All matmul-sliced operands
are kept f32 in VMEM (bf16 odd-offset slices force Mosaic sublane relayouts —
measured dead end); the MXU still multiplies in bf16 via default dot
precision, accumulating f32.

Replaces no reference component 1:1 — this is the TPU execution engine for
the reference hot loop (blind_denoising.py:216-222) and the DnCNN mid layers
(lib/frame2frame/dncnn/net.py:13-22).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 16  # bf16 sublane tile height: block rows and DMA starts stay aligned
EPS = 1e-5


def _interpret():
    return jax.default_backend() != "tpu"


_ABLATE_WARNED = False


def _ablate():
    """TIMING-ONLY kernel ablations: ``F2F_ABLATE`` = comma list of
    {``nomask``, ``noodd``, ``nostats``, ``nodot``, ``nodma``} skips the
    named per-element pass in the fused kernels to bound the yield of the
    corresponding candidate optimization (round-3 verdict task 2: each
    candidate needs a measured number or a measured refutation).
    ``nodma`` skips every slab DMA start/wait (compute runs on stale
    scratch), isolating the kernels' compute-only time — full minus nodma
    is the un-hidden DMA wait. Outputs are WRONG with any ablation
    active — set this only in perf probes, never in a real run (the probe
    scripts own it). Any active ablation emits a loud warning once per
    process so a leftover env var cannot silently corrupt a real run;
    note the set is read at TRACE time, so clearing the env after a jit
    cache is built does not deactivate an already-traced ablation."""
    abl = frozenset(filter(None, os.environ.get("F2F_ABLATE", "").split(",")))
    unknown = abl - {"nomask", "noodd", "nostats", "nodot", "nodma"}
    assert not unknown, f"unknown F2F_ABLATE entries: {sorted(unknown)}"
    global _ABLATE_WARNED
    if abl and not _ABLATE_WARNED:
        _ABLATE_WARNED = True
        import warnings

        warnings.warn(
            f"F2F_ABLATE={sorted(abl)} is active: fused-kernel outputs are "
            "WRONG (timing-only ablation). Unset F2F_ABLATE unless this is "
            "a perf probe.", stacklevel=2)
    return abl


def conv_mode(conv=None):
    """Conv formulation in {"hybrid", "odd", "even"}.

    Selection: the ``F2F_CONV`` env var when set (probe override), else the
    ``conv`` argument threaded from the caller (``OnlineDenoiser(...,
    conv_formulation=...)``), else "odd". ``F2F_ODD=0`` is a back-compat
    alias for "even".

    The formulations compute the exact same convolution:

    - **even** — the original pair-packed 9-dot form: each 3x3 tap is a
      (128, 128) matrix with half its 64x64 blocks zero (2x FLOP tax), but
      the operand slab is consumed as-is (no extra VPU work).
    - **odd** — the merged-tap scheme: building a one-pixel-shifted "odd"
      activation slab O[r] = (pixels 2*w2+1, 2*w2+2) lets each kernel row dy
      be covered by TWO matmuls with 3/4-dense weights ([[W0,0],[W1,W0]]
      against O at pair -1, [[W2,W1],[0,W2]] at pair 0) instead of three
      half-dense ones — a 1.5x FLOP cut for one extra roll+select VPU pass.

    Measured at 540p (v5e, round 3): **odd wins both directions** and is the
    default. fwd 0.789 vs 0.991 ms/layer even, bwd 1.136 odd vs 1.48 even;
    a hybrid (even fwd + odd bwd) was built and measured on the round-2
    observation that the even forward was then faster (0.75) — with the
    current codegen it is not, and the hybrid step regresses 29.9 -> 31.3
    ms/iter. The options stay selectable for future A/B (kernel codegen has
    already moved this ranking once).
    """
    env = os.environ.get("F2F_CONV")
    if env is not None:
        assert env in ("hybrid", "odd", "even"), env
        return env
    if os.environ.get("F2F_ODD", "1") == "0":
        return "even"
    if conv is not None:
        assert conv in ("hybrid", "odd", "even"), conv
        return conv
    return "odd"


def fwd_odd(conv=None):
    """Forward kernels use the odd-slab form (pack_kernel_odd)."""
    return conv_mode(conv) == "odd"


def bwd_odd(conv=None):
    """Backward kernels use the odd-slab form (pack_kernel_odd_bwd)."""
    return conv_mode(conv) in ("odd", "hybrid")


def store_odd_act(conv=None):
    """Round-4 VPU cut: when both directions run the odd form, the forward
    kernels EMIT the odd activation slab they build anyway (one extra
    astype-store per tile + a free DMA) and the backward kernels consume it
    by DMA — dropping the backward's a_prev rebuild (upcast+fma+max+mask)
    and its in-kernel odd-slab build (roll+roll+select), and shrinking the
    z_prev read to the epilogue-only rows. Numerically exact: the MXU
    multiplies operands in bf16 regardless, so the bf16 HBM round-trip of
    the dW operand reproduces the old in-VMEM value bit-for-bit.
    ``F2F_STORE_O=0`` reverts to the round-3 rebuild path for A/B."""
    return (conv_mode(conv) == "odd"
            and os.environ.get("F2F_STORE_O", "1") != "0")


def use_odd(conv=None):
    """Legacy umbrella switch — kept for external probes; the pipeline
    itself selects per-direction via fwd_odd()/bwd_odd()."""
    return conv_mode(conv) != "even"


def act_value():
    """Round-5 restructure (default ON; ``F2F_ACT_VALUE=0`` reverts): in the
    odd forward, the masked activation stays a VALUE instead of being stored
    to the f32 aslab scratch — its only consumer is the odd-slab build.

    Measured (540p, th=8, dot16, stored-O): in the standalone probe harness
    the fwd kernel gains 10% (1.847 -> 1.659 ms/layer,
    scripts/exp_chain_modes.py, bit-identical z/o/stats), but at STEP level
    the change is NEUTRAL (interleaved A/B: 29.9 vs 29.9 ms/iter) — in the
    real step Mosaic fuses the scratch store into the chain the same way it
    fuses the backward's dz store, and the probe win was the freed VMEM
    (2 x slab x 128 x 4B) easing a pressure the heavier probe kernel had.
    Kept ON for the VMEM headroom (the scratch is simply never allocated);
    the switch exists to re-A/B when Mosaic codegen moves. The same A/B on
    the BACKWARD dz slab measured flat (2.008 vs 2.013 ms/layer), so the
    backward keeps its scratch (the even dX slices and dW slices read it)."""
    return os.environ.get("F2F_ACT_VALUE", "1") == "1"


def dot_bf16(flag=None, default=False):
    """MXU dot operands explicitly downcast to bf16 (``F2F_DOT_BF16``).

    Measured facts (540p, th=8, v5e, round 4):

    - **Outputs are bit-identical either way.** Mosaic feeds the MXU bf16
      operands even for f32 slabs (JAX's DEFAULT dot precision truncates
      f32 operands on TPU), so the explicit astype changes no values — a
      kernel-level A/B of z AND the f32 stat sums showed max-abs-diff 0.0.
      This switch is therefore purely a performance knob.
    - Step: 31.2 -> 29.8 ms/iter (-4.5%). The win is NOT the dot rate (the
      MXU already ran at the bf16 rate); pre-truncating the slab once
      halves the dots' VMEM operand reads (f32 -> bf16 width) across the
      6 merged-tap dots, and lets the stored-o backward feed the stored
      bf16 slab straight to the MXU with no upcast (bwd stored_o 1.187 ->
      1.105 ms/layer).
    - Eval kernels REGRESS slightly (fwd eval 0.718 -> 0.745 ms/layer):
      the stats-free eval chain has fewer dots per byte of astype, so the
      extra VPU pass outweighs the operand-read saving.

    Hence per-path defaults: the training pipeline (_fused_fwd/_fused_bwd
    and the spatial variant) passes ``default=True``; the eval/serving
    chains keep ``default=False``. Setting ``F2F_DOT_BF16`` (``1``/``0``)
    overrides BOTH paths for A/B probes; an explicit ``flag`` wins over
    everything.

    Interpret mode (CPU tests) keeps the default OFF: XLA-CPU computes
    real f32 dots, so there the astype WOULD round — flipping it by
    default would loosen the tight f32 logic-oracle parity tests for no
    modeling gain (the TPU truncates either way). The dedicated dot16
    tests opt in via the env to cover the dot16 slab-handling paths.
    """
    if flag is not None:
        return bool(flag)
    env = os.environ.get("F2F_DOT_BF16")
    if env is not None:
        return env == "1"
    return default and not _interpret()


# ---------------------------------------------------------------------------
# geometry


class Geom:
    """Static layout constants for one (H, W2, tile_h) configuration."""

    def __init__(self, H, W2, tile_h):
        # (pair packing requires even W; W2 = W/2 itself may be odd)
        self.H, self.W2, self.tile_h = H, W2, tile_h
        self.wpad = W2 + 2
        self.n = tile_h * self.wpad
        assert self.n % ALIGN == 0, (
            f"tile rows {self.n} not {ALIGN}-aligned; pick tile_h such that "
            f"tile_h*(W2+2) % {ALIGN} == 0")
        self.T = -(-H // tile_h)
        self.tot = (self.T + 2) * self.n
        halo = self.wpad + 1
        self.off = -(-halo // ALIGN) * ALIGN
        assert self.n >= self.off
        self.slab = self.n + 2 * self.off
        self.shifts = tuple((dy - 1) * self.wpad + (dx - 1)
                            for dy in range(3) for dx in range(3))
        # odd formulation: slot t = dy*2 + s slides the odd slab by
        # (dy-1)*wpad + (-1 for s=0, 0 for s=1) rows (pair units)
        self.odd_shifts = tuple((dy - 1) * self.wpad + d
                                for dy in range(3) for d in (-1, 0))
        self.valid_lo = self.n
        self.valid_hi = self.n + H * self.wpad
        self.count = float(2 * H * W2)  # pixels per original channel

    def bwd_scratch_bytes(self, store_bytes=2, conv=None):
        """VMEM scratch footprint of the backward kernel — MUST mirror
        ``bwd_layer``'s scratch_shapes (plus its dX partial accumulators and
        the odd-form derived slabs). ``can_fuse`` (models/fused_apply.py)
        guards on this so the estimate and the kernel cannot drift apart."""
        slab, n = self.slab, self.n
        if store_odd_act(conv):
            # stored-O path: zp shrinks to n epilogue rows, a_prev rebuild
            # and its odd slab are replaced by the obf DMA + an upcast value
            return (2 * 2 * slab * 128 * store_bytes  # g/zi slabs (x2 buffers)
                    + 2 * n * 128 * store_bytes       # zp epilogue rows
                    + 2 * n * 128 * store_bytes       # obf (stored odd act)
                    + 2 * slab * 128 * 4              # dz slab, f32
                    + slab * 128 * 4                  # odd slab of dz (value)
                    + n * 128 * 4                     # oap upcast (value)
                    + 6 * 128 * 128 * 4               # dw accumulator
                    + 2 * n * 128 * store_bytes       # da output double buffer
                    + 3 * n * 128 * 4)                # dX partial accumulators
        odd_extra = 0
        if bwd_odd(conv):
            # odd slab of dz (held value) + odd slab of a_prev
            odd_extra = slab * 128 * 4 + (n + ALIGN) * 128 * 4
        return (3 * 2 * slab * 128 * store_bytes  # g/zi/zp slabs (x2 buffers)
                + 2 * slab * 128 * 4              # dz slab, f32
                + 2 * (n + ALIGN) * 128 * 4       # a_prev slab, f32
                + 9 * 128 * 128 * 4               # dw accumulator (>= 6-tap)
                + 2 * n * 128 * store_bytes       # da output double buffer
                + 3 * n * 128 * 4                 # dX partial accumulators
                + odd_extra)


def default_tile_h(W2):
    """Smallest tile height with 16-aligned tile rows (8 for even wpad % 4).

    Re-measured round 3 with the odd formulation: tile_h=16 regresses the
    production forward kernel 0.79 -> 1.13 ms/layer at 540p (despite a
    stripped-down experiment predicting ~10% gain — the extra slab VMEM at
    16 costs more than the halved per-tile overhead saves). 8 stays right.
    The stored-O backward (round 4) freed several f32 slabs, so ``F2F_TILE_H``
    exists as a probe override to re-rank (the round-3 verdict's task 2d).
    """
    env = os.environ.get("F2F_TILE_H")
    if env:
        th = int(env)
        assert (th * (W2 + 2)) % ALIGN == 0, (th, W2)
        return th
    for th in (8, 16, 32):
        if (th * (W2 + 2)) % ALIGN == 0:
            return th
    return 16


def to_flat(a2, g):
    """(1, H, W2, 128) packed image -> flat ((T+2)*n, 128) with zero
    head/tail tiles and zero pad columns. One traced pad+reshape (cheap)."""
    _, H, W2, C2 = a2.shape
    ap = jnp.pad(a2[0], ((0, g.T * g.tile_h - H), (1, 1), (0, 0)))
    flat = ap.reshape(g.T * g.n, C2)
    z = jnp.zeros((g.n, C2), flat.dtype)
    return jnp.concatenate([z, flat, z], axis=0)


def from_flat(flat, g):
    """Inverse of to_flat: flat array -> (1, H, W2, 128). Drops pad cols
    (which may hold garbage conv outputs — they are masked everywhere else)."""
    body = flat[g.n:g.n + g.T * g.tile_h * g.wpad]
    img = body.reshape(g.T * g.tile_h, g.wpad, flat.shape[-1])
    return img[:g.H, 1:g.wpad - 1][None]


def stack_tiles(H, tile_h):
    """Tiles per frame block in the stacked-serving layout: each frame gets
    ceil(H / tile_h) tiles, plus one more when H fills them exactly, so at
    least one zero separator row stops 3x3 conv bleed between frames."""
    T_f = -(-H // tile_h)
    return T_f + 1 if T_f * tile_h == H else T_f


def to_flat_stack(a2, g, T_f):
    """(B, H, W2, 128) packed frames -> flat ((B*T_f+2)*n, 128): frame k
    occupies tiles [k*T_f, (k+1)*T_f) with its trailing Hs - H rows zero.
    Requires g == Geom(B*T_f*tile_h, W2, tile_h)."""
    B, H, W2, C2 = a2.shape
    Hs = T_f * g.tile_h
    assert g.H == B * Hs and Hs > H, (g.H, B, Hs, H)
    ap = jnp.pad(a2, ((0, 0), (0, Hs - H), (1, 1), (0, 0)))
    flat = ap.reshape(B * Hs * g.wpad, C2)
    z = jnp.zeros((g.n, C2), flat.dtype)
    return jnp.concatenate([z, flat, z], axis=0)


def from_flat_stack(flat, H, g, T_f):
    """Inverse of to_flat_stack: flat -> (B, H, W2, 128)."""
    Hs = T_f * g.tile_h
    B = g.H // Hs
    body = flat[g.n:g.n + B * Hs * g.wpad]
    img = body.reshape(B, Hs, g.wpad, flat.shape[-1])
    return img[:, :H, 1:g.wpad - 1]


def _col_mask(g):
    """Static column masks (tile, slab): 0.0 at pad-pair flat positions."""
    def ok(start, length):
        pos = (np.arange(length) + start) % g.wpad
        return ((pos != 0) & (pos != g.wpad - 1)).astype(np.float32)

    return (jnp.asarray(ok(0, g.n)[:, None]),
            jnp.asarray(ok(-g.off, g.slab)[:, None]))


def pack_kernel_flat(w):
    """(3, 3, 64, 64) -> (9, 128, 128) pair-packed taps (ops/packed.py block
    structure: [c + 64p, d + 64q] nonzero iff 2*dw2 + p - q - 1 = dx)."""
    from .packed import pack_kernel

    return pack_kernel(w).reshape(9, 128, 128)


def fold_dw2(dw2):
    """Adjoint of pack_kernel_flat: (9, 2C, 2D) f32 -> (3, 3, C, D)."""
    C = dw2.shape[1] // 2
    D = dw2.shape[2] // 2
    taps = []
    for dy in range(3):
        d0, d1, d2 = dw2[dy * 3], dw2[dy * 3 + 1], dw2[dy * 3 + 2]
        tap0 = d0[C:, :D] + d1[:C, D:]   # dx=0: (dw2=0,p1,q0) + (dw2=1,p0,q1)
        tap1 = d1[:C, :D] + d1[C:, D:]   # dx=1: (dw2=1,p0,q0) + (dw2=1,p1,q1)
        tap2 = d1[C:, :D] + d2[:C, D:]   # dx=2: (dw2=1,p1,q0) + (dw2=2,p0,q1)
        taps.append(jnp.stack([tap0, tap1, tap2]))
    return jnp.stack(taps)


def pack_kernel_odd(w):
    """(3, 3, C, D) -> (6, 2C, 2D) merged-tap matrices for the odd-slab
    forward. Slot t = dy*2 + s; block rows m index the operand's pixel
    halves (2w2+2s+1+m), block cols p the output parity:

        s=0 (O at pair -1): [[W0, 0 ], [W1, W0]]
        s=1 (O at pair  0): [[W2, W1], [0,  W2]]

    (entry = W[dy, dx] with dx = o_in - p + 1 for input offset o_in.)"""
    C, D = w.shape[2], w.shape[3]
    Z = jnp.zeros((C, D), w.dtype)
    mats = []
    for dy in range(3):
        W0, W1, W2 = w[dy, 0], w[dy, 1], w[dy, 2]
        mats.append(jnp.concatenate([
            jnp.concatenate([W0, Z], 1), jnp.concatenate([W1, W0], 1)], 0))
        mats.append(jnp.concatenate([
            jnp.concatenate([W2, W1], 1), jnp.concatenate([Z, W2], 1)], 0))
    return jnp.stack(mats)


def pack_kernel_odd_bwd(w):
    """(3, 3, C, D) -> (6, 2D, 2C) merged-tap matrices for the odd-slab dX
    pass (operand: odd slab of dz, channels = D). Slot t = dy'*2 + s with
    source row dy = 2 - dy' (vertical flip folded into the weights so the
    kernel can reuse the forward's positive shift table); V = W^T (io):

        s=0: [[V2, 0 ], [V1, V2]]      s=1: [[V0, V1], [0, V0]]

    (entry = V[dy, dx] with dx = p - o_in where o_in = 2s - 1 + m.)"""
    wt = jnp.swapaxes(w, 2, 3)
    D, C = wt.shape[2], wt.shape[3]
    Z = jnp.zeros((D, C), w.dtype)
    mats = []
    for dyp in range(3):
        dy = 2 - dyp
        V0, V1, V2 = wt[dy, 0], wt[dy, 1], wt[dy, 2]
        mats.append(jnp.concatenate([
            jnp.concatenate([V2, Z], 1), jnp.concatenate([V1, V2], 1)], 0))
        mats.append(jnp.concatenate([
            jnp.concatenate([V0, V1], 1), jnp.concatenate([Z, V0], 1)], 0))
    return jnp.stack(mats)


def fold_dw6(dw6):
    """Adjoint of pack_kernel_odd: (6, 2C, 2D) f32 -> (3, 3, C, D)."""
    C = dw6.shape[1] // 2
    D = dw6.shape[2] // 2
    taps = []
    for dy in range(3):
        M0, M1 = dw6[dy * 2], dw6[dy * 2 + 1]
        tap0 = M0[:C, :D] + M0[C:, D:]
        tap1 = M0[C:, :D] + M1[:C, D:]
        tap2 = M1[:C, :D] + M1[C:, D:]
        taps.append(jnp.stack([tap0, tap1, tap2]))
    return jnp.stack(taps)


def _odd_slab(e):
    """Odd (one-pixel-shifted) view of an even pair-packed slab value:
    O[r] = (lanes 64: of e[r], lanes :64 of e[r+1]) so lane h+64m holds the
    channels of pixel 2*w2 + 1 + m. The last row is wrap garbage — callers
    never slice it (off >= wpad + 1 bounds every access to slab-2)."""
    roll = jnp.roll if _interpret() else pltpu.roll
    # pltpu.roll wants non-negative shifts: -64 == +64 (mod 128 lanes),
    # -1 == nrows-1 (mod nrows)
    r0 = roll(e, 64, axis=1)               # lane rotate: [e[:,64:], e[:,:64]]
    r1 = roll(r0, e.shape[0] - 1, axis=0)  # row r+1 view
    lane = lax.broadcasted_iota(jnp.int32, e.shape, 1)
    return jnp.where(lane < 64, r0, r1)


def _odd_slab_cat(e):
    """``_odd_slab`` as static slice+concat instead of roll+roll+select —
    dtype-agnostic (``pltpu.roll`` is 32-bit only), so the build can run
    directly on bf16 data at half the VPU data volume, and on an operand
    that is ALREADY the bf16 dot copy (dot16 mode) instead of building in
    f32 and downcasting the full odd slab afterwards. Value-identical to
    ``_odd_slab`` including the never-read wrap-garbage last row
    (``e[:1]`` wraps to the end exactly as the row-roll does)."""
    ro = jnp.concatenate([e[1:], e[:1]], axis=0)        # row r+1 view
    return jnp.concatenate([e[:, 64:], ro[:, :64]], axis=1)


def odd_cat():
    """Odd-slab build formulation: ``F2F_ODD_CAT=1`` selects the
    slice+concat build (``_odd_slab_cat``) over roll+roll+select
    (``_odd_slab``) in all fused kernels. Timing-only switch — the two
    builds produce bit-identical values (verified on hardware, all modes).

    Default OFF: measured and REFUTED on v5e (540p, th=8, interleaved
    scan-timed A/B, best-of-2): despite touching ~40% less data (the cat
    build runs directly on the existing bf16 dot copy instead of building
    in f32 and downcasting the full odd slab), it is consistently ~1-5%
    slower everywhere — train fwd 0.975 -> 0.984 ms/layer (dot16),
    train bwd 1.305 -> 1.367, and even the eval kernel where cat
    additionally eliminates the entire per-tile f32 upcast slab
    (bf16 chain: 0.888 -> 0.897). Mosaic lowers the lane/sublane concats
    to more VPU work than roll+select; the odd-slab build is not the
    binding term at this tile size. Kept as a probe switch."""
    return os.environ.get("F2F_ODD_CAT") == "1"


def dz_bf16():
    """Store the backward kernel's dz slab directly in bf16
    (``F2F_DZ_BF16``; active only in the odd form with bf16 dot operands).
    In that mode the f32 dz slab has no f32 consumer — both the dX and dW
    dots read the bf16 copy — so a direct bf16 store is bit-identical to
    {f32 store + separate astype pass} while skipping one full f32 store
    and one astype pass per tile and halving the dz scratch. The odd slab
    of dz then builds via ``_odd_slab_cat`` (``pltpu.roll`` is 32-bit
    only).

    Default OFF: measured and REFUTED on v5e (540p, th=8, stored-O,
    interleaved scan-timed A/B): bwd 1.313 -> 1.362 ms/layer. The forced
    cat build costs more than the saved passes — Mosaic fuses the f32
    store and the astype into the existing dz chain nearly free, while the
    cat shuffles are real extra VPU work (same failure mode as
    ``odd_cat``). Kept as a probe switch; bit parity is pinned by
    tests/test_fused_stack.py."""
    return os.environ.get("F2F_DZ_BF16") == "1"


def tile_vec(v):
    """(64,) -> (128,) duplicated across the two packing parities."""
    return jnp.concatenate([v, v])


def fold_vec(v2):
    """(128,) parity sums -> (64,): add the two parity copies."""
    return v2[:64] + v2[64:]


# ---------------------------------------------------------------------------
# forward kernel


def _slab_dma(hbm, slabs, sems, j, slot, g):
    """Copy descriptor for tile j's halo slab into double buffer ``slot``.

    The offset is written as ALIGN * q so Mosaic can prove tile alignment."""
    start = (j * (g.n // ALIGN) - g.off // ALIGN) * ALIGN
    return pltpu.make_async_copy(
        hbm.at[pl.ds(start, g.slab)], slabs.at[slot], sems.at[slot])


def _fwd_kernel(zprev_hbm, w2_ref, vecs_ref, cmask_slab_ref,
                *rest, g, odd, dyn_valid=False, stack=None, emit_act=False,
                emit_stats=True, dot16=False, cat=False, abl=frozenset()):
    rest = list(rest)
    if dyn_valid:
        # spatial sharding (ops/fused_spatial.py): the row-validity window is
        # shard-dependent, so it arrives as SMEM scalars instead of being
        # baked in — one compiled program serves every shard (SPMD)
        vb_ref = rest.pop(0)
        valid_lo, valid_hi = vb_ref[0], vb_ref[1]
    else:
        valid_lo, valid_hi = g.valid_lo, g.valid_hi
    z_out = rest.pop(0)
    o_out = rest.pop(0) if emit_act else None
    stats_ref = rest.pop(0) if emit_stats else None
    if len(rest) == 3:
        zslab, aslab, sem = rest
    else:  # odd form, act_value(): no activation scratch at all
        (zslab, sem), aslab = rest, None
    i = pl.program_id(0)
    n, off, slab = g.n, g.off, g.slab

    def frame_valid():
        """Stacked-serving row mask: the body holds B frames of T_f tiles
        each (frame rows [0, frame_h) valid, the Hs - frame_h trailing rows
        are zero separators that stop conv bleed between frames). Frames are
        tile-aligned, so the position of this tile within its frame block is
        rem(i-1, T_f)*n; halo rows wrap into the neighbor block by < n
        positions, so one conditional add/sub folds them (off < n <= blk)."""
        T_f, frame_h = stack
        blk = T_f * n
        base = lax.rem(i - 1, T_f) * n - off
        x = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + base
        x = jnp.where(x < 0, x + blk, x)
        x = jnp.where(x >= blk, x - blk, x)
        return x < frame_h * g.wpad

    @pl.when(i == 0)
    def _():
        if emit_stats:
            stats_ref[:] = jnp.zeros_like(stats_ref)
        if "nodma" not in abl:  # timing-only ablation, see _ablate
            # prefetch the first compute tile while this zero tile writes out
            _slab_dma(zprev_hbm, zslab, sem, 1, 1, g).start()

    @pl.when((i == 0) | (i == g.T + 1))
    def _():
        z_out[:] = jnp.zeros_like(z_out)
        if emit_act:
            o_out[:] = jnp.zeros_like(o_out)

    def compute(slot):
        # static parity: all refs statically addressed (see _bwd_kernel)
        zs = zslab.at[slot]
        start = (i * (n // ALIGN) - off // ALIGN) * ALIGN
        s = vecs_ref[0, :]   # prev-layer BN scale (tiled to 128)
        b = vecs_ref[1, :]   # prev-layer BN shift
        # validity: global flat position within the real image rows
        pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
        vb = (pos >= valid_lo) & (pos < valid_hi)
        if stack is not None:
            vb = vb & frame_valid()
        valid = vb.astype(jnp.float32)
        act = jnp.maximum(zs[:].astype(jnp.float32) * s + b, 0.0)
        if "nomask" not in abl:  # timing-only ablation, see _ablate
            act = act * (valid * cmask_slab_ref[:])
        if aslab is None:
            # odd form, act_value(): the activation stays a VALUE — its only
            # consumer is the odd-slab build, so the f32 scratch round trip
            # was pure materialization cost (round-5 A/B: -10% fwd kernel,
            # scripts/exp_chain_modes.py; bit-identical). The scratch's old
            # rationale (VPU/MXU overlap via the double buffer) was already
            # refuted by the round-3 "pipe" experiment.
            src = act
        else:
            as_ = aslab.at[slot]
            as_[:] = act
            src = as_[:]

        # three independent partial accumulators break the serial add chain
        # between consecutive dots so the MXU pipeline stays full.
        # Odd mode: the one-pixel-shifted slab as a held value sliced by the
        # 6 dots — measured BEST among the variants tried (direct-to-scratch
        # odd build 0.82, single-pass build with inline masks 1.09-1.13,
        # this form 0.79 ms/layer at 540p)
        parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
        if odd:
            # bf16 dot operands (dot16): one astype pass over the slab buys
            # the MXU's bf16 rate on all 6 dots (see dot_bf16). The cat
            # build runs directly on the bf16 copy; the roll build must
            # stay f32 (pltpu.roll is 32-bit only) and downcast after.
            if "noodd" in abl:
                os_ = src
            elif cat:
                os_ = _odd_slab_cat(
                    src.astype(jnp.bfloat16) if dot16 else src)
            else:
                os_ = _odd_slab(src)
            if dot16 and os_.dtype != jnp.bfloat16:
                os_ = os_.astype(jnp.bfloat16)
            if emit_act:
                # emit the odd activation slab this kernel built anyway: the
                # backward consumes it by DMA instead of rebuilding a_prev +
                # its odd slab (store_odd_act) — one astype-store per tile
                o_out[:] = os_[off:off + n, :].astype(o_out.dtype)
            if "nodot" not in abl:  # timing-only ablation, see _ablate
                for t, sh in enumerate(g.odd_shifts):
                    xs = os_[off + sh:off + sh + n, :]
                    parts[t % 3] += lax.dot_general(
                        xs, w2_ref[t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        else:
            asd = as_[:].astype(jnp.bfloat16) if dot16 else None
            if "nodot" not in abl:
                for t, sh in enumerate(g.shifts):
                    xs = (asd if dot16 else as_)[off + sh:off + sh + n, :]
                    parts[t % 3] += lax.dot_general(
                        xs, w2_ref[t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        acc = parts[0] + parts[1] + parts[2]
        z_out[:] = acc.astype(z_out.dtype)
        if emit_stats and "nostats" not in abl:
            # stats over valid interior positions (pad cols masked; trailing
            # H-pad rows produce acc==0 since their inputs were masked to 0,
            # except boundary leakage rows — mask them too)
            m = cmask_slab_ref[off:off + n, :] * valid[off:off + n, :]
            zc = acc * m
            stats_ref[0, :] += jnp.sum(zc, axis=0)
            stats_ref[1, :] += jnp.sum(zc * acc, axis=0)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            if "nodma" not in abl:  # timing-only ablation, see _ablate
                @pl.when(i < g.T)
                def _():
                    _slab_dma(zprev_hbm, zslab, sem, i + 1, 1 - slot,
                              g).start()

                _slab_dma(zprev_hbm, zslab, sem, i, slot, g).wait()
            compute(slot)


def fwd_layer(zprev_flat, w2_flat, s_vec, b_vec, g, odd=False,
              valid_bounds=None, stack=None, emit_act=False, emit_stats=True,
              dot16=None):
    """One fused mid-layer forward pass over the flat layout.

    zprev_flat: ((T+2)*n, 128) bf16 — previous layer's raw conv output (or
    the stack input in a-space with (s, b) = (1, 0));
    w2_flat: (9, 128, 128) bf16 packed kernel (pack_kernel_flat), or
    (6, 128, 128) merged-tap matrices (pack_kernel_odd) when ``odd``;
    s_vec/b_vec: (128,) f32 BN affine of the PREVIOUS layer
    (z -> a = relu(s*z + b));
    valid_bounds: optional (2,) int32 [lo, hi) row-validity window in local
    flat positions, replacing the static [g.n, g.n + H*wpad) — used by the
    spatially sharded pipeline where halo tiles hold real neighbor rows;
    stack: optional static (T_f, frame_h) — the body is a stack of frames
    of T_f tiles each with only the first frame_h rows real (batched
    serving eval, models/fused_apply.fused_eval_apply_batch);
    emit_act: also return the odd activation slab (store_odd_act path,
    odd-mode training forward only);
    emit_stats: accumulate and return the BN batch statistics — False for
    eval-mode forwards (running stats), which skips the per-tile stat
    masking/reductions entirely (the round-3 verdict's stats-free variant);
    dot16: bf16 MXU dot operands (None -> the F2F_DOT_BF16 env default; see
    ``dot_bf16``).

    Returns z_flat bf16, then (if emit_act) o_flat, then (if emit_stats)
    stats (2, 128) f32 = (sum z, sum z^2) per lane.
    """
    assert not (stack is not None and valid_bounds is not None)
    assert not (emit_act and not odd), "store_odd_act requires the odd form"
    dot16 = dot_bf16(dot16)
    ntap = 6 if odd else 9
    assert w2_flat.shape[0] == ntap, (w2_flat.shape, odd)
    # a single (slab, 1) column mask is exact for BOTH lane halves of the odd
    # slab (position r and r+1): valid-row boundary discrepancies coincide
    # with pad columns — the last flat position of the image body and the
    # position before the first are both pad pairs
    _, cmask_slab = _col_mask(g)
    vecs = jnp.stack([s_vec, b_vec]).astype(jnp.float32)
    dyn = valid_bounds is not None

    in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ntap, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.slab, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    w_dtype = jnp.bfloat16 if dot16 else zprev_flat.dtype
    ins = [zprev_flat, w2_flat.astype(w_dtype), vecs, cmask_slab]
    if dyn:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ins.append(jnp.asarray(valid_bounds, jnp.int32))

    out_specs = [pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((g.tot, 128), zprev_flat.dtype)]
    if emit_act:
        out_specs.append(pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((g.tot, 128),
                                              zprev_flat.dtype))
    if emit_stats:
        out_specs.append(pl.BlockSpec((2, 128), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((2, 128), jnp.float32))

    scratch = [pltpu.VMEM((2, g.slab, 128), zprev_flat.dtype)]
    if not (odd and act_value()):
        # even form: the dots slice the stored activation scratch; odd form
        # with act_value() keeps the activation as a value (see act_value)
        scratch.append(pltpu.VMEM((2, g.slab, 128), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    outs = pl.pallas_call(
        partial(_fwd_kernel, g=g, odd=odd, dyn_valid=dyn, stack=stack,
                emit_act=emit_act, emit_stats=emit_stats, dot16=dot16,
                cat=odd_cat(), abl=_ablate()),
        grid=(g.T + 2,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    return outs if isinstance(outs, (tuple, list)) else (outs,)


# ---------------------------------------------------------------------------
# act-space eval forward (serving): eval-mode BatchNorm is a FIXED per-channel
# affine (running statistics), so the scale folds into the conv weights
# (out-channel scaling) and the bias+ReLU+masking ride the kernel's own
# epilogue. Activations chain POST-activation between layers: the consumer
# does no affine, no validity windowing of operands (its input is already
# masked by the producer's epilogue), and for stacked serving no in-dot frame
# mask at all — only the odd-slab build remains per element. This is the
# round-4 VPU cut for the eval/serving paths (the training pipeline cannot do
# this: the affine there depends on batch statistics computed in the very
# kernel that produces the layer).


def _fwd_eval_kernel(a_hbm, w2_ref, bvec_ref, cmask_ref, *rest, g, odd,
                     stack=None, upcast=True, dyn_valid=False, dot16=False,
                     cat=False):
    rest = list(rest)
    if dyn_valid:
        # spatially sharded serving: shard-local row-validity window as SMEM
        # scalars (see _fwd_kernel) — applied only in the epilogue mask here
        vb_ref = rest.pop(0)
        valid_lo, valid_hi = vb_ref[0], vb_ref[1]
    else:
        valid_lo, valid_hi = g.valid_lo, g.valid_hi
    a_out = rest.pop(0)
    if upcast:
        land, fslab, sem = rest     # bf16 landing + f32 compute slab
    else:
        fslab, sem = rest           # f32 chain: the DMA lands compute-ready
        land = fslab
    i = pl.program_id(0)
    n, off, slab = g.n, g.off, g.slab

    @pl.when(i == 0)
    def _():
        _slab_dma(a_hbm, land, sem, 1, 1, g).start()

    @pl.when((i == 0) | (i == g.T + 1))
    def _():
        a_out[:] = jnp.zeros_like(a_out)

    def compute(slot):
        if upcast and fslab is not land:
            fslab.at[slot][:] = land.at[slot][:].astype(jnp.float32)
        src = fslab.at[slot]
        parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
        if odd:
            # roll build: 32 bits only (pltpu.roll), dot16 downcasts the
            # rolled slab right before the 6 dots. cat build: runs at the
            # slab's own dtype — with a bf16 chain + dot16 the odd slab is
            # built straight from the bf16 landing slab (upcast=False,
            # no per-tile f32 pass at all)
            if cat:
                src_v = src[:]
                if dot16 and src_v.dtype == jnp.float32:
                    src_v = src_v.astype(jnp.bfloat16)
                os_ = _odd_slab_cat(src_v)
            else:
                os_ = _odd_slab(src[:])
                if dot16:
                    os_ = os_.astype(jnp.bfloat16)
            for t, sh in enumerate(g.odd_shifts):
                parts[t % 3] += lax.dot_general(
                    os_[off + sh:off + sh + n, :], w2_ref[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            # even + dot16 + bf16 chain: src IS the bf16 landing slab — the
            # dots stream straight from it, no per-tile elementwise pass at
            # all before the MXU (the leanest serving kernel form)
            if dot16 and src.dtype == jnp.float32:
                asd = src[:].astype(jnp.bfloat16)
            else:
                asd = src
            for t, sh in enumerate(g.shifts):
                parts[t % 3] += lax.dot_general(
                    asd[off + sh:off + sh + n, :], w2_ref[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = parts[0] + parts[1] + parts[2]
        # epilogue: acc is already scale*conv (weights pre-scaled); finish the
        # activation with bias + ReLU, and zero pad columns / H-pad rows /
        # (stacked) separator rows so the NEXT layer needs no operand masking
        pos = lax.broadcasted_iota(jnp.int32, (n, 1), 0) + i * n
        vb = (pos >= valid_lo) & (pos < valid_hi)
        if stack is not None:
            # output tiles sit fully inside one frame block (frames are
            # tile-aligned), so no halo wrap handling is needed here
            T_f, frame_h = stack
            rel = (lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                   + lax.rem(i - 1, T_f) * n)
            vb = vb & (rel < frame_h * g.wpad)
        m = vb.astype(jnp.float32) * cmask_ref[:]
        a_out[:] = (jnp.maximum(acc + bvec_ref[0, :], 0.0)
                    * m).astype(a_out.dtype)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            @pl.when(i < g.T)
            def _():
                _slab_dma(a_hbm, land, sem, i + 1, 1 - slot, g).start()

            _slab_dma(a_hbm, land, sem, i, slot, g).wait()
            compute(slot)


def fwd_layer_eval(a_flat, w2s_flat, b_vec, g, odd=True, stack=None,
                   valid_bounds=None, dot16=None):
    """One act-space eval mid-layer: a_i -> a_{i+1} (both post-activation).

    a_flat: ((T+2)*n, 128) flat POST-activation input (bf16 or f32 chain —
    an f32 chain skips the per-tile upcast at 2x the DMA volume; both are
    measured A/B candidates since the DMA is hidden);
    w2s_flat: packed taps of ``w * s[out]`` where s is the layer's eval BN
    scale (gamma*rsqrt(running_var+eps)) — pack_kernel_odd or
    pack_kernel_flat of the pre-scaled kernel;
    b_vec: (128,) tiled eval BN shift (beta - mean*s);
    dot16: bf16 MXU dot operands (None -> F2F_DOT_BF16; see ``dot_bf16``).
    With dot16 + a bf16 chain + the even form, the per-tile upcast slab is
    dropped entirely and the dots stream straight from the landing slab.
    Returns (a_next_flat,) with the same dtype as ``a_flat``.
    """
    dot16 = dot_bf16(dot16)
    ntap = 6 if odd else 9
    assert w2s_flat.shape[0] == ntap, (w2s_flat.shape, odd)
    assert not (stack is not None and valid_bounds is not None)
    cmask_tile, _ = _col_mask(g)
    # upcast = build a separate f32 compute slab; unnecessary when the dots
    # take bf16 operands anyway and no 32-bit roll is needed (even form, or
    # the odd form with the dtype-agnostic cat build)
    cat = odd_cat()
    upcast = a_flat.dtype != jnp.float32 and not (
        dot16 and (not odd or cat))
    dyn = valid_bounds is not None
    bvec = b_vec.astype(jnp.float32).reshape(1, 128)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((ntap, 128, 128), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g.n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    ins = [a_flat,
           w2s_flat.astype(jnp.bfloat16 if dot16 else a_flat.dtype),
           bvec, cmask_tile]
    if dyn:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ins.append(jnp.asarray(valid_bounds, jnp.int32))

    scratch = [pltpu.VMEM((2, g.slab, 128), a_flat.dtype)]
    if upcast:
        scratch.append(pltpu.VMEM((2, g.slab, 128), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    out, = pl.pallas_call(
        partial(_fwd_eval_kernel, g=g, odd=odd, stack=stack, upcast=upcast,
                dyn_valid=dyn, dot16=dot16, cat=cat),
        grid=(g.T + 2,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((g.tot, 128), a_flat.dtype)],
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    return (out,)


# ---------------------------------------------------------------------------
# backward kernel


def _body_dma(hbm, dst, sems, j, slot, g, rows):
    """Copy descriptor for tile j's BODY rows [j*n, j*n + rows) (no halo)."""
    return pltpu.make_async_copy(
        hbm.at[pl.ds(j * g.n, rows)], dst.at[slot], sems.at[slot])


def _bwd_kernel(g_hbm, zi_hbm, zp_hbm, *rest, g, first_layer, odd,
                dyn_valid=False, stored_o=False, dot16=False, cat=False,
                dz16=False, abl=frozenset()):
    rest = list(rest)
    o_hbm = rest.pop(0) if stored_o else None
    w2t_ref, vecs_ref, cmask_slab_ref = rest[:3]
    rest = rest[3:]
    if dyn_valid:
        vb_ref = rest.pop(0)
        valid_lo, valid_hi = vb_ref[0], vb_ref[1]
    else:
        valid_lo, valid_hi = g.valid_lo, g.valid_hi
    if stored_o:
        (da_out, dw2_ref, stats_ref, gslab, zislab, zpslab, dzslab,
         oslab, sem_g, sem_zi, sem_zp, sem_o) = rest
    else:
        (da_out, dw2_ref, stats_ref, gslab, zislab, zpslab, dzslab,
         apslab, sem_g, sem_zi, sem_zp) = rest
    i = pl.program_id(0)
    n, off, slab = g.n, g.off, g.slab

    def dmas(j, slot):
        cps = [_slab_dma(g_hbm, gslab, sem_g, j, slot, g),
               _slab_dma(zi_hbm, zislab, sem_zi, j, slot, g)]
        if stored_o:
            # stored-O path: the dW operand arrives prebuilt (body rows
            # only), and z_prev is needed only for the BN-backward epilogue
            # (body rows; skipped entirely on the first layer)
            cps.append(_body_dma(o_hbm, oslab, sem_o, j, slot, g, n))
            if not first_layer:
                cps.append(_body_dma(zp_hbm, zpslab, sem_zp, j, slot, g, n))
        else:
            cps.append(_slab_dma(zp_hbm, zpslab, sem_zp, j, slot, g))
        return cps

    @pl.when(i == 0)
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)
        if "nodma" not in abl:  # timing-only ablation, see _ablate
            for cp in dmas(1, 1):
                cp.start()

    @pl.when((i == 0) | (i == g.T + 1))
    def _():
        da_out[:] = jnp.zeros_like(da_out)

    def compute(slot):
        # ``slot`` is a Python int, so every ref below is statically
        # addressed — a dynamically slot-indexed variant measured ~25% slower
        # (Mosaic falls off the vectorized path); the price is two copies of
        # the body (one per parity)
        gs, zis, zps = gslab.at[slot], zislab.at[slot], zpslab.at[slot]
        dzs = dzslab.at[slot]
        start = (i * (n // ALIGN) - off // ALIGN) * ALIGN
        # vecs rows (prefolded on the host so dz is one fma chain):
        # 0 A = gamma_i*rstd_i (also the ReLU-mask scale), 1 b_i,
        # 2 B = -gamma_i*rstd_i^2*dgamma_i/M,
        # 3 C = gamma_i*rstd_i*(mean_i*rstd_i*dgamma_i/M - dbeta_i/M),
        # 4 s_prev, 5 b_prev, 6 rstd_prev, 7 -mean_prev*rstd_prev
        v = vecs_ref
        pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
        valid = ((pos >= valid_lo) & (pos < valid_hi)).astype(jnp.float32)
        vm = valid * cmask_slab_ref[:]

        zi = zis[:].astype(jnp.float32)
        relu_mask = ((zi * v[0, :] + v[1, :]) > 0.0).astype(jnp.float32)
        gt = gs[:].astype(jnp.float32) * relu_mask       # dL/dy
        dz_val = v[0, :] * gt + v[2, :] * zi + v[3, :]
        if "nomask" not in abl:  # timing-only ablation, see _ablate
            dz_val = dz_val * vm
        if dz16:
            # odd+dot16: the f32 dz slab has NO f32 consumer (dX and dW dots
            # both read the bf16 copy), so store dz bf16 directly —
            # bit-identical outputs with one full f32 store and one astype
            # pass fewer per tile, at half the dz scratch (``dz_bf16``)
            dzs[:] = dz_val.astype(jnp.bfloat16)
            dzv = dzs[:]
        else:
            dzs[:] = dz_val
            # bf16 dot-operand copy of the dz slab (dW slices below; and the
            # even dX slices) — one astype pass buys the bf16 MXU rate on
            # 6-12 dots
            dzv = dzs[:].astype(jnp.bfloat16) if dot16 else None

        # dX: three partial accumulators break the serial add chain (see
        # forward kernel). Odd form: slide the odd slab of dz with the
        # FORWARD shift table against flip+transpose merged weights
        # (pack_kernel_odd_bwd); even form: slide dz by -shift against the
        # io-transposed taps.
        parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
        if odd:
            # odd slab of dz as a held value with exactly 6 slice consumers
            # (dX). Adding the dW dots as 6 more consumers — value or
            # scratch — measured SLOWER (1.28 / 1.23 vs 1.15 ms/layer), so
            # dW keeps the oap x even-dz form below.
            if "noodd" in abl:
                odzs = dzv if dot16 else dzs[:]
            elif cat or dz16:
                # the cat build consumes the EXISTING bf16 dot copy (dzv) —
                # the roll build pays 3 f32 passes + a full-odd-slab astype.
                # Under dz16 the roll build is impossible (pltpu.roll is
                # 32-bit only), so the cat build is mandatory.
                odzs = _odd_slab_cat(dzv if dot16 else dzs[:])
            else:
                odzs = _odd_slab(dzs[:])
                if dot16:
                    odzs = odzs.astype(jnp.bfloat16)
            if "nodot" not in abl:
                for t, sh in enumerate(g.odd_shifts):
                    ds = odzs[off + sh:off + sh + n, :]
                    parts[t % 3] += lax.dot_general(
                        ds, w2t_ref[t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        else:
            if "nodot" not in abl:
                for t, sh in enumerate(g.shifts):
                    ds = (dzv if dot16 else dzs)[off - sh:off - sh + n, :]
                    parts[t % 3] += lax.dot_general(
                        ds, w2t_ref[t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        acc = parts[0] + parts[1] + parts[2]
        da_out[:] = acc.astype(da_out.dtype)

        if stored_o:
            # dW operand: the odd activation slab the forward stored —
            # upcast only (the round-3 path rebuilt a_prev with
            # upcast+fma+max+mask and its odd slab with roll+roll+select
            # here, per element per tile; store_odd_act moves all of it to
            # one astype-store in the forward)
            # dot16: the stored slab is ALREADY bf16 — feed it straight to
            # the MXU (the f32 path pays an upcast pass here)
            oap = (oslab.at[slot][:] if dot16
                   else oslab.at[slot][:].astype(jnp.float32))
            if "nodot" not in abl:
                for t, sh in enumerate(g.odd_shifts):
                    dsl = (dzv if dot16 else dzs)[off - sh:off - sh + n, :]
                    dw2_ref[t] += lax.dot_general(
                        oap, dsl, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            if not first_layer and "nostats" not in abl:
                # epilogue: BN-backward reductions for layer i-1 — needs the
                # even-layout a_prev mask and zhat_prev, from z_prev body rows
                zpc = zps[:].astype(jnp.float32)
                m = (cmask_slab_ref[off:off + n, :] * valid[off:off + n, :])
                ap_pos = ((zpc * v[4, :] + v[5, :]) > 0.0).astype(jnp.float32)
                gp = acc * ap_pos * m
                zhp = zpc * v[6, :] + v[7, :]
                stats_ref[0, :] += jnp.sum(gp, axis=0)
                stats_ref[1, :] += jnp.sum(gp * zhp, axis=0)
            return

        # dW needs a_prev = relu(affine_prev(z_prev)) on interior rows only:
        # sum_m a[m+s] dz[m] is re-indexed as sum_m a[m] dz[m-s], which is
        # globally equivalent under the tile accumulation and lets the a
        # scratch drop its halo (dz already has one)
        aps = apslab.at[slot]
        zpc = zps[off:off + n + ALIGN, :].astype(jnp.float32)
        ap_val = jnp.maximum(zpc * v[4, :] + v[5, :], 0.0)
        if "nomask" not in abl:  # timing-only ablation, see _ablate
            ap_val = ap_val * vm[off:off + n + ALIGN, :]
        aps[:] = ap_val
        ap_int = aps[0:n, :]
        if odd:
            # dM[t] = sum_r O_ap[r] (x) dz[r - odd_shift_t]: odd slab of
            # a_prev (one extra interior row feeds lane half 1) against the
            # even dz SCRATCH slices
            if "noodd" in abl:
                oap = aps[:][:n, :]
            elif cat:
                oap = _odd_slab_cat(
                    aps[:].astype(jnp.bfloat16) if dot16 else aps[:])[:n, :]
            else:
                oap = _odd_slab(aps[:])[:n, :]
            if dot16 and oap.dtype != jnp.bfloat16:
                oap = oap.astype(jnp.bfloat16)
            if "nodot" not in abl:
                for t, sh in enumerate(g.odd_shifts):
                    dsl = (dzv if dot16 else dzs)[off - sh:off - sh + n, :]
                    dw2_ref[t] += lax.dot_general(
                        oap, dsl, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        else:
            apv = ap_int.astype(jnp.bfloat16) if dot16 else ap_int
            if "nodot" not in abl:
                for t, sh in enumerate(g.shifts):
                    dsl = (dzv if dot16 else dzs)[off - sh:off - sh + n, :]
                    dw2_ref[t] += lax.dot_general(
                        apv, dsl, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        if not first_layer and "nostats" not in abl:
            # epilogue: BN-backward reductions for layer i-1 from the da we
            # just produced: sum(gt_prev), sum(gt_prev * zhat_prev)
            m = (cmask_slab_ref[off:off + n, :] * valid[off:off + n, :])
            gp = acc * (ap_int > 0.0).astype(jnp.float32) * m
            zhp = zpc[:n, :] * v[6, :] + v[7, :]
            stats_ref[0, :] += jnp.sum(gp, axis=0)
            stats_ref[1, :] += jnp.sum(gp * zhp, axis=0)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            if "nodma" not in abl:  # timing-only ablation, see _ablate
                @pl.when(i < g.T)
                def _():
                    for cp in dmas(i + 1, 1 - slot):
                        cp.start()

                for cp in dmas(i, slot):
                    cp.wait()
            compute(slot)


def bwd_layer(g_flat, zi_flat, zprev_flat, w2t_flat, vecs, g,
              first_layer=False, odd=False, valid_bounds=None, o_flat=None,
              dot16=None):
    """One fused mid-layer backward pass.

    g_flat: cotangent of a_i (this layer's post-ReLU output) in flat layout;
    zi_flat / zprev_flat: saved raw conv outputs of layers i and i-1;
    w2t_flat: (9, 128, 128) packed kernel io-transposed per tap (NOT
    tap-flipped: the even kernel slices with -shift, which is the flip), or
    (6, 128, 128) flip+transpose merged taps (pack_kernel_odd_bwd) when
    ``odd``;
    vecs: (8, 128) f32 prefolded per-channel vectors (see kernel comment);
    valid_bounds: optional (2,) int32 dynamic row-validity window (see
    ``fwd_layer``);
    o_flat: optional stored odd activation slab of a_prev (the forward's
    ``emit_act`` output, store_odd_act path; odd mode only) — replaces the
    in-kernel a_prev rebuild for dW;
    dot16: bf16 MXU dot operands (None -> F2F_DOT_BF16; see ``dot_bf16``).

    Returns (da_prev_flat bf16, dw (ntap,128,128) f32 — fold with fold_dw2
    or fold_dw6 per mode — and stats_prev (2,128) f32).
    """
    dot16 = dot_bf16(dot16)
    ntap = 6 if odd else 9
    assert w2t_flat.shape[0] == ntap, (w2t_flat.shape, odd)
    stored_o = o_flat is not None
    assert not (stored_o and not odd), "stored-O path requires the odd form"
    _, cmask_slab = _col_mask(g)
    dyn = valid_bounds is not None

    in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
    ]
    ins = [g_flat, zi_flat, zprev_flat]
    if stored_o:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        ins.append(o_flat)
    in_specs += [
            pl.BlockSpec((ntap, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.slab, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    ins += [w2t_flat.astype(jnp.bfloat16 if dot16 else g_flat.dtype),
            vecs, cmask_slab]
    if dyn:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ins.append(jnp.asarray(valid_bounds, jnp.int32))

    dz16 = dz_bf16() and dot16 and odd
    dz_dtype = jnp.bfloat16 if dz16 else jnp.float32
    if stored_o:
        # zp shrinks to the epilogue's body rows (dummy-sized on the first
        # layer, whose epilogue is skipped and zp never DMA'd or read)
        zp_rows = ALIGN if first_layer else g.n
        scratch_shapes = [
            pltpu.VMEM((2, g.slab, 128), g_flat.dtype),     # g
            pltpu.VMEM((2, g.slab, 128), g_flat.dtype),     # zi
            pltpu.VMEM((2, zp_rows, 128), g_flat.dtype),    # zp (epilogue)
            pltpu.VMEM((2, g.slab, 128), dz_dtype),         # dz
            pltpu.VMEM((2, g.n, 128), o_flat.dtype),        # stored O
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((2, g.slab, 128), g_flat.dtype),
            pltpu.VMEM((2, g.slab, 128), g_flat.dtype),
            pltpu.VMEM((2, g.slab, 128), g_flat.dtype),
            pltpu.VMEM((2, g.slab, 128), dz_dtype),
            pltpu.VMEM((2, g.n + ALIGN, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    da, dw2, stats = pl.pallas_call(
        partial(_bwd_kernel, g=g, first_layer=first_layer, odd=odd,
                dyn_valid=dyn, stored_o=stored_o, dot16=dot16,
                cat=odd_cat(), dz16=dz16, abl=_ablate()),
        grid=(g.T + 2,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ntap, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g.tot, 128), g_flat.dtype),
            jax.ShapeDtypeStruct((ntap, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    return da, dw2, stats


# ---------------------------------------------------------------------------
# the differentiable mid-stack


def _affine_from_stats(mean, var, gamma, beta):
    rstd = lax.rsqrt(var + EPS)
    s = gamma * rstd
    return s, beta - mean * s, rstd


def _io_t(w2_flat):
    """(9, 128, 128) packed taps -> per-tap io transpose (for dX)."""
    return w2_flat.transpose(0, 2, 1)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_mid_stack(ws, gammas, betas, a1, H, tile_h,
                    store_dtype=jnp.bfloat16, conv=None):
    """(conv3x3 + BatchNorm(train) + ReLU) ^ L over pair-packed activations.

    ws: (L, 3, 3, 64, 64) f32; gammas/betas: (L, 64) f32;
    a1: (1, H, W2, 128) packed post-ReLU stack input (W2 = W/2);
    conv: formulation override (see conv_mode; env F2F_CONV wins).
    Returns (a_out (1, H, W2, 128) f32, means (L, 64), vars (L, 64)).

    Semantics match the per-layer reference chain (net.py:13-22, torch
    BatchNorm2d train mode: biased variance, eps=1e-5). Activations are
    stored bf16 between layers (the established bf16-chain accuracy mode).
    """
    out, _ = _fused_fwd(ws, gammas, betas, a1, H, tile_h, store_dtype, conv)
    return out


def _fused_fwd(ws, gammas, betas, a1, H, tile_h,
               store_dtype=jnp.bfloat16, conv=None):
    L = ws.shape[0]
    odd = fwd_odd(conv)
    store_o = store_odd_act(conv)
    dot16 = dot_bf16(default=True)  # training default: see dot_bf16
    g = Geom(H, a1.shape[2], tile_h)
    a_flat = to_flat(a1.astype(store_dtype), g)

    cur = a_flat
    s_vec = jnp.ones((128,), jnp.float32)
    b_vec = jnp.zeros((128,), jnp.float32)
    z_list, o_list, means, vars_, svecs, bvecs = [], [], [], [], [], []
    for i in range(L):
        w2 = pack_kernel_odd(ws[i]) if odd else pack_kernel_flat(ws[i])
        svecs.append(s_vec); bvecs.append(b_vec)
        outs = fwd_layer(cur, w2, s_vec, b_vec, g, odd=odd,
                         emit_act=store_o, dot16=dot16)
        if store_o:
            z, o, stats = outs
            o_list.append(o)
        else:
            z, stats = outs
        m = fold_vec(stats[0]) / g.count
        v = fold_vec(stats[1]) / g.count - jnp.square(m)
        s64, b64, _ = _affine_from_stats(m, v, gammas[i], betas[i])
        s_vec, b_vec = tile_vec(s64), tile_vec(b64)
        z_list.append(z)
        means.append(m); vars_.append(v)
        cur = z

    # final BN+ReLU applied outside, in FLAT space — the ((T+2)n, 128) view
    # keeps (8, 128) tiles, where the (1, H, W2, 128) image view costs ~2x in
    # degenerate tilings; from_flat then drops pad rows/cols
    zf = z_list[-1].astype(jnp.float32)
    a_out = from_flat(jnp.maximum(zf * s_vec + b_vec, 0.0), g)
    means = jnp.stack(means); vars_ = jnp.stack(vars_)
    res = (ws, gammas, betas, a_flat, tuple(z_list), tuple(o_list),
           jnp.stack(svecs), jnp.stack(bvecs), means, vars_)
    return (a_out, means, vars_), res


def _fused_bwd(H, tile_h, store_dtype, conv, res, cts):
    da_out, _dm, _dv = cts  # stat cotangents are zero (stop_gradient updates)
    ws, gammas, betas, a_flat, z_list, o_list, svecs, bvecs, means, vars_ = res
    L = ws.shape[0]
    odd = bwd_odd(conv)
    store_o = store_odd_act(conv)
    dot16 = dot_bf16(default=True)  # training default: see dot_bf16
    g = Geom(H, da_out.shape[2], tile_h)

    # cotangent of z_L through the final BN+ReLU, reduced in FLAT space (the
    # image view's degenerate tilings cost ~3x on these reductions); pad
    # positions contribute zero because to_flat zero-fills the cotangent
    sL, bL, rstdL = _affine_from_stats(means[-1], vars_[-1],
                                       gammas[-1], betas[-1])
    sL2, bL2 = tile_vec(sL), tile_vec(bL)
    g_flat = to_flat(da_out.astype(store_dtype), g)
    zLf = z_list[-1].astype(jnp.float32)
    mask = ((zLf * sL2 + bL2) > 0.0).astype(jnp.float32)
    gt = g_flat.astype(jnp.float32) * mask
    zhat = (zLf - tile_vec(means[-1])) * tile_vec(rstdL)
    dbeta = fold_vec(jnp.sum(gt, axis=0))
    dgamma = fold_vec(jnp.sum(gt * zhat, axis=0))

    dws, dgammas, dbetas = [None] * L, [None] * L, [None] * L
    for i in range(L - 1, -1, -1):
        if i + 1 < L:
            s_i, b_i = svecs[i + 1], bvecs[i + 1]
        else:
            s_i, b_i = sL2, bL2
        rstd_i = lax.rsqrt(vars_[i] + EPS)
        A = gammas[i] * rstd_i
        B = -A * rstd_i * (dgamma / g.count)
        C = A * (means[i] * rstd_i * (dgamma / g.count) - dbeta / g.count)
        if i > 0:
            rstd_p = lax.rsqrt(vars_[i - 1] + EPS)
            D, E = tile_vec(rstd_p), tile_vec(-means[i - 1] * rstd_p)
        else:
            D, E = jnp.ones((128,)), jnp.zeros((128,))
        vecs = jnp.stack([
            s_i, b_i, tile_vec(B), tile_vec(C),
            svecs[i], bvecs[i], D, E,
        ]).astype(jnp.float32)
        w2t = (pack_kernel_odd_bwd(ws[i]) if odd
               else _io_t(pack_kernel_flat(ws[i])))
        zprev = z_list[i - 1] if i > 0 else a_flat
        da, dw2, stats = bwd_layer(g_flat, z_list[i], zprev, w2t, vecs, g,
                                   first_layer=(i == 0), odd=odd,
                                   o_flat=o_list[i] if store_o else None,
                                   dot16=dot16)
        dws[i] = fold_dw6(dw2) if odd else fold_dw2(dw2)
        dgammas[i] = dgamma
        dbetas[i] = dbeta
        if i > 0:
            dbeta = fold_vec(stats[0])
            dgamma = fold_vec(stats[1])
        g_flat = da

    da1 = from_flat(g_flat, g).astype(jnp.float32)
    return (jnp.stack(dws), jnp.stack(dgammas), jnp.stack(dbetas), da1)


fused_mid_stack.defvjp(
    lambda ws, g, b, a1, H, th, sd, cv: _fused_fwd(ws, g, b, a1, H, th, sd,
                                                   cv),
    _fused_bwd)
