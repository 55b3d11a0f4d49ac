"""Fused Pallas kernels for the network ENDS + loss of the online step.

Round-5 structural attack on the measured ~3.3 ms/iter of "end convs +
pack/unpack glue" (BASELINE.md "XLA-remainder decomposition"): with the
mid-stack already fused (ops/fused_stack.py), each fine-tune iteration still
paid XLA for

- ``to_flat``/``from_flat`` layout copies of the ~69 MB bf16 activation slab
  (4 per iteration: a1 in, a_out out, cotangent in, da1 out),
- the final BN+ReLU and its backward's dgamma/dbeta reductions as
  HBM-resident f32 passes over the (tot, 128) slab (~138 MB each at 540p),
- the image-space boundary convs (1<->64 ch) and the L1 loss elementwise.

These kernels keep the ENTIRE iteration in the flat pair-packed layout
(train/flat_step.py drives them): the boundary convs run as merged-tap odd
dots with the 1-channel image embedded at lanes {0, 64} (zero rows/cols of
the packed weights make the padded-channel gradients exactly zero), the L1
loss and its sign-backward ride the last conv's own kernel, and the final
BN+ReLU backward's reductions ride that kernel's epilogue — the same
stored-O / stats-epilogue machinery the mid layers use.

Reference semantics covered: the loss/optimizer inner loop of
blind_denoising.py:216-222 (summed L1 vs the masked warped previous frame,
nn.L1Loss(size_average=False), blind_denoising.py:47) and the DnCNN boundary
layers (lib/frame2frame/dncnn/net.py:13-22). No reference counterpart exists
for the kernels themselves — this is TPU execution engineering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_stack import (
    ALIGN as ALIGN_,
    _body_dma,
    _col_mask,
    _interpret,
    _odd_slab,
    _slab_dma,
    dot_bf16,
)


def _params():
    return (None if _interpret() else
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))


# ---------------------------------------------------------------------------
# lane embedding of the 1-channel image into the 64-channel packed layout


def embed_pair_lanes(p2, dtype=None):
    """(..., H, W2, 2) pair-packed 1-channel image -> (..., H, W2, 128) with
    the pair at lanes {0, 64} (channel-0 of both parities), zeros elsewhere —
    the layout a (3,3,1,64) kernel zero-padded to (3,3,64,64) convolves
    exactly (pack_image lane convention: lane = c + 64*p)."""
    z = jnp.zeros(p2.shape[:-1] + (63,), p2.dtype if dtype is None else dtype)
    p2 = p2 if dtype is None else p2.astype(dtype)
    return jnp.concatenate([p2[..., :1], z, p2[..., 1:], z], axis=-1)


def odd_slab_host(e):
    """XLA-side odd slab of a flat array (same values as fused_stack's
    in-kernel ``_odd_slab`` including the never-read wrap row): used ONCE per
    frame on the loop-invariant input so the per-iteration first-conv kernel
    does no element work at all."""
    ro = jnp.concatenate([e[1:], e[:1]], axis=0)
    return jnp.concatenate([e[:, 64:], ro[:, :64]], axis=1)


def embed_w_in(w_in):
    """(3, 3, 1, 64) -> (3, 3, 64, 64) with input channel 0 carrying w_in."""
    return jnp.pad(w_in, ((0, 0), (0, 0), (0, 63), (0, 0)))


def embed_w_out(w_out):
    """(3, 3, 64, 1) -> (3, 3, 64, 64) with output channel 0 carrying it."""
    return jnp.pad(w_out, ((0, 0), (0, 0), (0, 0), (0, 63)))


# ---------------------------------------------------------------------------
# first conv: z1 = conv_in(x), consuming the PREBUILT odd slab of the input


def _first_conv_kernel(ox_hbm, w6_ref, z_out, oxslab, sem, *, g):
    i = pl.program_id(0)
    n, off = g.n, g.off

    @pl.when(i == 0)
    def _():
        _slab_dma(ox_hbm, oxslab, sem, 1, 1, g).start()

    @pl.when((i == 0) | (i == g.T + 1))
    def _():
        z_out[:] = jnp.zeros_like(z_out)

    def compute(slot):
        os_ = oxslab.at[slot]
        parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
        for t, sh in enumerate(g.odd_shifts):
            parts[t % 3] += lax.dot_general(
                os_[off + sh:off + sh + n, :], w6_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        z_out[:] = (parts[0] + parts[1] + parts[2]).astype(z_out.dtype)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            @pl.when(i < g.T)
            def _():
                _slab_dma(ox_hbm, oxslab, sem, i + 1, 1 - slot, g).start()

            _slab_dma(ox_hbm, oxslab, sem, i, slot, g).wait()
            compute(slot)


def first_conv(ox_flat, w6_in, g, dot16=None):
    """z1 = conv_in(x) in flat space: ``ox_flat`` is the host-built odd slab
    of the lane-embedded input (loop-invariant — built once per frame), so
    the kernel is pure DMA + 6 merged-tap dots. Returns (tot, 128) in
    ``ox_flat``'s dtype with garbage at pad positions (masked by every
    consumer, like any mid z)."""
    dot16 = dot_bf16(dot16, default=True)
    z, = pl.pallas_call(
        partial(_first_conv_kernel, g=g),
        grid=(g.T + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((g.tot, 128), ox_flat.dtype)],
        scratch_shapes=[pltpu.VMEM((2, g.slab, 128), ox_flat.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
        compiler_params=_params(),
    )(ox_flat, w6_in.astype(jnp.bfloat16 if dot16 else ox_flat.dtype))
    return z


# ---------------------------------------------------------------------------
# last conv + final BN/ReLU + summed-L1 loss, fused forward
#
# aux arrays (built once per frame, f32 flat layout, lanes {0, 64}):
#   aux_c = mask * x - target      aux_m = mask
# loss = sum |aux_c - aux_m * noise| over the flat body (zero off-lane /
# pad / invalid positions by construction), identical in exact arithmetic to
# the image-space sum |mask * (x - noise) - target|.


def _last_fwd_kernel(z_hbm, auxc_hbm, auxm_hbm, w6_ref, vecs_ref,
                     cmask_slab_ref, noise_out, o_out, loss_ref,
                     zslab, cslab, mslab, sem_z, sem_c, sem_m, *, g, dot16):
    i = pl.program_id(0)
    n, off, slab = g.n, g.off, g.slab

    def dmas(j, slot):
        return [_slab_dma(z_hbm, zslab, sem_z, j, slot, g),
                _body_dma(auxc_hbm, cslab, sem_c, j, slot, g, n),
                _body_dma(auxm_hbm, mslab, sem_m, j, slot, g, n)]

    @pl.when(i == 0)
    def _():
        loss_ref[:] = jnp.zeros_like(loss_ref)
        for cp in dmas(1, 1):
            cp.start()

    @pl.when((i == 0) | (i == g.T + 1))
    def _():
        noise_out[:] = jnp.zeros_like(noise_out)
        o_out[:] = jnp.zeros_like(o_out)

    def compute(slot):
        zs = zslab.at[slot]
        s = vecs_ref[0, :]
        b = vecs_ref[1, :]
        start = (i * (n // ALIGN_) - off // ALIGN_) * ALIGN_
        pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
        valid = ((pos >= g.valid_lo) & (pos < g.valid_hi)).astype(jnp.float32)
        act = jnp.maximum(zs[:].astype(jnp.float32) * s + b, 0.0)
        act = act * (valid * cmask_slab_ref[:])
        os_ = _odd_slab(act)
        if dot16:
            os_ = os_.astype(jnp.bfloat16)
        o_out[:] = os_[off:off + n, :].astype(o_out.dtype)
        parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
        for t, sh in enumerate(g.odd_shifts):
            parts[t % 3] += lax.dot_general(
                os_[off + sh:off + sh + n, :], w6_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = parts[0] + parts[1] + parts[2]
        noise_out[:] = acc
        u = cslab.at[slot][:] - mslab.at[slot][:] * acc
        loss_ref[0, :] += jnp.sum(jnp.abs(u), axis=0)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            @pl.when(i < g.T)
            def _():
                for cp in dmas(i + 1, 1 - slot):
                    cp.start()

            for cp in dmas(i, slot):
                cp.wait()
            compute(slot)


def last_loss_fwd(z_flat, aux_c, aux_m, w6_out, s_vec, b_vec, g, dot16=None):
    """Fused {final BN+ReLU -> conv_out -> masked summed L1} forward.

    z_flat: (tot, 128) bf16 raw conv output of the last mid layer;
    aux_c/aux_m: (tot, 128) f32 per-frame loss constants (see module doc);
    w6_out: (6, 128, 128) merged taps of the lane-embedded output kernel;
    s_vec/b_vec: (128,) final BN affine. Returns (noise_flat f32 — the raw
    network output in flat layout, garbage at pad positions, all masked by
    aux_m's zeros where it matters — o_flat bf16 stored odd act slab for the
    backward, loss_partial (1, 128) f32 whose total sum is the loss)."""
    dot16 = dot_bf16(dot16, default=True)
    _, cmask_slab = _col_mask(g)
    vecs = jnp.stack([s_vec, b_vec]).astype(jnp.float32)
    noise, o, lossp = pl.pallas_call(
        partial(_last_fwd_kernel, g=g, dot16=dot16),
        grid=(g.T + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.slab, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g.tot, 128), jnp.float32),
            jax.ShapeDtypeStruct((g.tot, 128), z_flat.dtype),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, g.slab, 128), z_flat.dtype),
            pltpu.VMEM((2, g.n, 128), jnp.float32),
            pltpu.VMEM((2, g.n, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(z_flat, aux_c, aux_m,
      w6_out.astype(jnp.bfloat16 if dot16 else z_flat.dtype), vecs,
      cmask_slab)
    return noise, o, lossp


# ---------------------------------------------------------------------------
# fused backward of {loss -> conv_out -> final BN+ReLU}:
#   e  = aux_m * sign(aux_c - aux_m * noise)   (so dL/dnoise = -e)
#   gL = conv_out^T(-e)  (the minus folded into the caller's negated taps)
#   dW_out = -sum oL (x) e-shifts              (caller negates the fold)
#   epilogue: dbeta/dgamma reductions of the LAST mid BN from gL
#     (the same stats-epilogue pattern as fused_stack._bwd_kernel)


def _last_bwd_kernel(noise_hbm, auxc_hbm, auxm_hbm, zp_hbm, o_hbm,
                     v6_ref, vecs_ref, cmask_slab_ref,
                     da_out, dw_ref, stats_ref,
                     nslab, cslab, mslab, zpslab, oslab, eslab,
                     sem_n, sem_c, sem_m, sem_zp, sem_o, *, g, dot16):
    i = pl.program_id(0)
    n, off, slab = g.n, g.off, g.slab

    def dmas(j, slot):
        return [_slab_dma(noise_hbm, nslab, sem_n, j, slot, g),
                _slab_dma(auxc_hbm, cslab, sem_c, j, slot, g),
                _slab_dma(auxm_hbm, mslab, sem_m, j, slot, g),
                _body_dma(zp_hbm, zpslab, sem_zp, j, slot, g, n),
                _body_dma(o_hbm, oslab, sem_o, j, slot, g, n)]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)
        for cp in dmas(1, 1):
            cp.start()

    @pl.when((i == 0) | (i == g.T + 1))
    def _():
        da_out[:] = jnp.zeros_like(da_out)

    def compute(slot):
        v = vecs_ref
        start = (i * (n // ALIGN_) - off // ALIGN_) * ALIGN_
        pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
        valid = ((pos >= g.valid_lo)
                 & (pos < g.valid_hi)).astype(jnp.float32)
        m_aux = mslab.at[slot][:]
        u = cslab.at[slot][:] - m_aux * nslab.at[slot][:]
        es = eslab.at[slot]
        es[:] = m_aux * jnp.sign(u)
        ev = es[:].astype(jnp.bfloat16) if dot16 else None
        oe = _odd_slab(es[:])
        if dot16:
            oe = oe.astype(jnp.bfloat16)
        parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
        for t, sh in enumerate(g.odd_shifts):
            parts[t % 3] += lax.dot_general(
                oe[off + sh:off + sh + n, :], v6_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = parts[0] + parts[1] + parts[2]  # = gL (taps pre-negated)
        da_out[:] = acc.astype(da_out.dtype)

        oap = (oslab.at[slot][:] if dot16
               else oslab.at[slot][:].astype(jnp.float32))
        for t, sh in enumerate(g.odd_shifts):
            dsl = (ev if dot16 else es)[off - sh:off - sh + n, :]
            dw_ref[t] += lax.dot_general(
                oap, dsl, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # epilogue: dbeta/dgamma of the LAST mid BN (layer L-1) from the gL
        # we just produced — vecs rows: 0 s_{L-1}, 1 b_{L-1}, 2 rstd_{L-1},
        # 3 -mean_{L-1}*rstd_{L-1} (the _bwd_kernel stats-epilogue pattern)
        m_ = cmask_slab_ref[off:off + n, :] * valid[off:off + n, :]
        zpc = zpslab.at[slot][:].astype(jnp.float32)
        ap_pos = ((zpc * v[0, :] + v[1, :]) > 0.0).astype(jnp.float32)
        gp = acc * ap_pos * m_
        zhp = zpc * v[2, :] + v[3, :]
        stats_ref[0, :] += jnp.sum(gp, axis=0)
        stats_ref[1, :] += jnp.sum(gp * zhp, axis=0)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            @pl.when(i < g.T)
            def _():
                for cp in dmas(i + 1, 1 - slot):
                    cp.start()

            for cp in dmas(i, slot):
                cp.wait()
            compute(slot)


def last_loss_bwd(noise_flat, aux_c, aux_m, zprev_flat, o_flat, v6_out, vecs,
                  g, dot16=None):
    """Fused backward of the loss + conv_out + final BN/ReLU head.

    noise_flat: the forward's f32 network output; zprev_flat: the last mid
    layer's raw conv output (epilogue); o_flat: the forward's stored odd act
    slab; v6_out: NEGATED flip+transpose merged taps of the lane-embedded
    output kernel (pack_kernel_odd_bwd of -w, so ``da`` needs no sign fix);
    vecs: (4, 128) f32 [s_{L-1}, b_{L-1}, rstd_{L-1}, -mean*rstd].
    Returns (gL bf16 — cotangent of the last mid ACTIVATION — dw6 f32 whose
    NEGATED fold is dW_out, stats (2,128) = (dbeta, dgamma-sum) of the last
    mid BN)."""
    dot16 = dot_bf16(dot16, default=True)
    _, cmask_slab = _col_mask(g)
    da, dw6, stats = pl.pallas_call(
        partial(_last_bwd_kernel, g=g, dot16=dot16),
        grid=(g.T + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.slab, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g.tot, 128), zprev_flat.dtype),
            jax.ShapeDtypeStruct((6, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, g.slab, 128), jnp.float32),   # noise
            pltpu.VMEM((2, g.slab, 128), jnp.float32),   # aux_c
            pltpu.VMEM((2, g.slab, 128), jnp.float32),   # aux_m
            pltpu.VMEM((2, g.n, 128), zprev_flat.dtype),  # zp epilogue rows
            pltpu.VMEM((2, g.n, 128), o_flat.dtype),      # stored O
            pltpu.VMEM((2, g.slab, 128), jnp.float32),   # e
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(noise_flat, aux_c, aux_m, zprev_flat, o_flat,
      v6_out.astype(jnp.bfloat16 if dot16 else jnp.float32), vecs,
      cmask_slab)
    return da, dw6, stats


# ---------------------------------------------------------------------------
# first-layer weight gradient: dW_in[t] = sum_k Ox[k + sh_t] (x) dz1[k]
# with dz1 = da0 * (z1 > 0) * mask (the input-side ReLU backward), using the
# same global re-index equivalence as the mid dW (fused_stack._bwd_kernel).


def _first_dw_kernel(da_hbm, z1_hbm, ox_hbm, cmask_ref, dw_ref,
                     daslab, z1slab, oxslab, sem_da, sem_z1, sem_ox,
                     *, g, dot16):
    i = pl.program_id(0)
    n, off = g.n, g.off

    def dmas(j, slot):
        return [_body_dma(da_hbm, daslab, sem_da, j, slot, g, n),
                _body_dma(z1_hbm, z1slab, sem_z1, j, slot, g, n),
                _slab_dma(ox_hbm, oxslab, sem_ox, j, slot, g)]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        for cp in dmas(1, 1):
            cp.start()

    def compute(slot):
        pos = lax.broadcasted_iota(jnp.int32, (n, 1), 0) + i * n
        valid = ((pos >= g.valid_lo)
                 & (pos < g.valid_hi)).astype(jnp.float32)
        m_ = cmask_ref[:] * valid
        relu = (z1slab.at[slot][:].astype(jnp.float32) > 0.0)
        gp = (daslab.at[slot][:].astype(jnp.float32)
              * relu.astype(jnp.float32) * m_)
        if dot16:
            gp = gp.astype(jnp.bfloat16)
        ox = oxslab.at[slot]
        for t, sh in enumerate(g.odd_shifts):
            dw_ref[t] += lax.dot_general(
                ox[off + sh:off + sh + n, :], gp,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    for slot in (0, 1):
        @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
        def _(slot=slot):
            @pl.when(i < g.T)
            def _():
                for cp in dmas(i + 1, 1 - slot):
                    cp.start()

            for cp in dmas(i, slot):
                cp.wait()
            compute(slot)


def first_dw(da0_flat, z1_flat, ox_flat, g, dot16=None):
    """dW of conv_in: contracts the prebuilt input odd slab against the
    masked input-side ReLU cotangent. Returns (6, 128, 128) f32 (fold with
    fold_dw6; rows outside lanes {0, 64} are exactly zero because ox is)."""
    dot16 = dot_bf16(dot16, default=True)
    cmask_tile, _ = _col_mask(g)
    dw6, = pl.pallas_call(
        partial(_first_dw_kernel, g=g, dot16=dot16),
        grid=(g.T + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((g.n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((6, 128, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, g.n, 128), da0_flat.dtype),
            pltpu.VMEM((2, g.n, 128), z1_flat.dtype),
            pltpu.VMEM((2, g.slab, 128), ox_flat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(da0_flat, z1_flat, ox_flat, cmask_tile)
    return dw6
