"""Round-5 experiment: restructure the fwd kernel's VPU element chain.

The round-4 nodma/nodot ablations established the 26 ms/iter skeleton is the
Mosaic-materialized VPU chains, not DMA or dots (BASELINE.md "DMA-vs-chain
split"). The semantic op count predicts 2-3x less time, so the lever is HOW
the chain is expressed — which intermediates Mosaic materializes
(docs/ROADMAP_R5.md round-4 update). This script A/Bs chain STRUCTURES on
the production forward kernel's exact DMA/double-buffer skeleton (odd form,
stored-O, dot16):

- prod:    act -> f32 aslab scratch store -> roll-build odd slab from the
           scratch -> bf16 downcast value -> 6 dots + o_out store
           (ops/fused_stack._fwd_kernel today)
- novalst: no f32 aslab store at all — act stays a VALUE, the odd slab is
           built from it and lives as a value (Mosaic chooses what to
           materialize; the aslab double buffer only existed for a VPU/MXU
           overlap that the round-3 "pipe" experiment already refuted)
- osscr:   act value -> odd slab stored ONCE to a bf16 scratch; the 6 dots
           and o_out read the scratch (intermediates at half width, one
           explicit materialization instead of two)
- twostore: odd slab built by TWO lane-half STORES into the bf16 scratch
           (os[:, :64] = act[:, 64:]; os[:-1, 64:] = act[1:, :64]) — no
           roll, no select, the store masks do the lane selection

All variants compute identical z/stats (parity checked at the end). Run on
TPU: python scripts/exp_chain_modes.py [--hw 540x960]
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(H=540, W=960, reps=3, iters=20):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from frame2frame_tpu.ops.fused_stack import (
        ALIGN,
        Geom,
        _col_mask,
        _odd_slab,
        _slab_dma,
        default_tile_h,
    )
    from frame2frame_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    g = Geom(H, W // 2, default_tile_h(W // 2))
    _, cmask_slab = _col_mask(g)

    def kern(zprev_hbm, w6_ref, vecs_ref, cmask_ref, z_out, o_out, stats_ref,
             *scratch, mode):
        if mode == "prod":
            zslab, aslab, sem = scratch
        else:
            zslab, oslab, sem = scratch
        i = pl.program_id(0)
        n, off, slab = g.n, g.off, g.slab

        @pl.when(i == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)
            _slab_dma(zprev_hbm, zslab, sem, 1, 1, g).start()

        @pl.when((i == 0) | (i == g.T + 1))
        def _():
            z_out[:] = jnp.zeros_like(z_out)
            o_out[:] = jnp.zeros_like(o_out)

        def compute(slot):
            zs = zslab.at[slot]
            start = (i * (n // ALIGN) - off // ALIGN) * ALIGN
            s = vecs_ref[0, :]
            b = vecs_ref[1, :]
            pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
            vb = (pos >= g.valid_lo) & (pos < g.valid_hi)
            valid = vb.astype(jnp.float32)
            if mode == "bf16chain":
                # the whole element chain in bf16 arithmetic: no upcast, no
                # downcast, half the bytes per pass. NOT bit-identical (the
                # affine rounds bf16 per op instead of once at the dot) —
                # this measures whether the chains are VMEM-bandwidth-bound
                # (the cat build is dtype-agnostic; pltpu.roll is 32-bit)
                s16 = s.astype(jnp.bfloat16)
                b16 = b.astype(jnp.bfloat16)
                m16 = (valid * cmask_ref[:]).astype(jnp.bfloat16)
                act16 = jnp.maximum(zs[:] * s16 + b16,
                                    jnp.bfloat16(0.0)) * m16
                from frame2frame_tpu.ops.fused_stack import _odd_slab_cat
                os_ = _odd_slab_cat(act16)
                o_out[:] = os_[off:off + n, :]
                parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
                for t, sh in enumerate(g.odd_shifts):
                    parts[t % 3] += lax.dot_general(
                        os_[off + sh:off + sh + n, :], w6_ref[t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                acc = parts[0] + parts[1] + parts[2]
                z_out[:] = acc.astype(z_out.dtype)
                m = cmask_ref[off:off + n, :] * valid[off:off + n, :]
                zc = acc * m
                stats_ref[0, :] += jnp.sum(zc, axis=0)
                stats_ref[1, :] += jnp.sum(zc * acc, axis=0)
                return
            act = jnp.maximum(zs[:].astype(jnp.float32) * s + b, 0.0)
            act = act * (valid * cmask_ref[:])

            if mode == "prod":
                aslab.at[slot][:] = act
                os_ = _odd_slab(aslab.at[slot][:]).astype(jnp.bfloat16)
                src = None
            elif mode == "novalst":
                os_ = _odd_slab(act).astype(jnp.bfloat16)
                src = None
            elif mode == "osscr":
                oslab.at[slot][:] = _odd_slab(act).astype(jnp.bfloat16)
                src = oslab.at[slot]
            elif mode == "twostore":
                ob = oslab.at[slot]
                a16 = act.astype(jnp.bfloat16)
                ob[:, 0:64] = a16[:, 64:128]
                ob[0:slab - 1, 64:128] = a16[1:slab, 0:64]
                # last row: wrap garbage like _odd_slab's roll — never read
                # by the dot slices (off >= wpad + 1) but keep it defined
                ob[slab - 1:slab, 64:128] = a16[0:1, 0:64]
                src = ob

            if src is None:
                o_out[:] = os_[off:off + n, :]
                sl = lambda k: os_[k:k + n, :]
            else:
                o_out[:] = src[off:off + n, :]
                sl = lambda k: src[k:k + n, :]

            parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
            for t, sh in enumerate(g.odd_shifts):
                parts[t % 3] += lax.dot_general(
                    sl(off + sh), w6_ref[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = parts[0] + parts[1] + parts[2]
            z_out[:] = acc.astype(z_out.dtype)
            m = cmask_ref[off:off + n, :] * valid[off:off + n, :]
            zc = acc * m
            stats_ref[0, :] += jnp.sum(zc, axis=0)
            stats_ref[1, :] += jnp.sum(zc * acc, axis=0)

        for slot in (0, 1):
            @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
            def _(slot=slot):
                @pl.when(i < g.T)
                def _():
                    _slab_dma(zprev_hbm, zslab, sem, i + 1, 1 - slot, g).start()
                _slab_dma(zprev_hbm, zslab, sem, i, slot, g).wait()
                compute(slot)

    def make(mode):
        if mode == "prod":
            scr = [pltpu.VMEM((2, g.slab, 128), jnp.bfloat16),
                   pltpu.VMEM((2, g.slab, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
        else:
            scr = [pltpu.VMEM((2, g.slab, 128), jnp.bfloat16),
                   pltpu.VMEM((2, g.slab, 128), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA((2,))]
        return pl.pallas_call(
            partial(kern, mode=mode),
            grid=(g.T + 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g.slab, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g.tot, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((g.tot, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((2, 128), jnp.float32),
            ],
            scratch_shapes=scr,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((g.tot, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w6 = jnp.asarray(rng.standard_normal((6, 128, 128)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    vecs = jnp.asarray(np.stack([np.full(128, 1.01, np.float32),
                                 np.full(128, 0.02, np.float32)]))

    modes = ("prod", "novalst", "osscr", "twostore", "bf16chain")
    ref = None
    for mode in modes:
        f = make(mode)

        @jax.jit
        def run(z, w6, vecs, f=f):
            def body(c, _):
                zo, oo, st = f(z, w6, vecs + c * 1e-20, cmask_slab)
                return c + st[0, 0] * 1e-20, None
            return lax.scan(body, 0.0, None, length=iters)[0]

        o = run(z, w6, vecs)
        float(np.asarray(o))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = run(z, w6, vecs)
            float(np.asarray(o))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{mode}: {best * 1000:.3f} ms/layer = "
              f"{best / g.T * 1e6:.2f} us/tile", flush=True)

        zo, oo, st = jax.jit(f)(z, w6, vecs, cmask_slab)
        zo, oo, st = np.asarray(zo), np.asarray(oo), np.asarray(st)
        if ref is None:
            ref = (zo, oo, st)
        elif mode == "bf16chain":
            # intentionally NOT bit-identical — report the drift instead
            dz = np.abs(zo.astype(np.float32) - ref[0].astype(np.float32))
            print(f"  bf16chain z max-abs-diff vs prod: {dz.max():.6f} "
                  f"(rel {dz.max() / max(np.abs(ref[0]).max(), 1e-9):.2e})")
        else:
            bit_z = bool((zo == ref[0]).all())
            bit_s = bool((st == ref[2]).all())
            # the o slab's last-row wrap garbage is mode-dependent; compare
            # only the rows the backward ever reads (all of o_out is read,
            # so compare fully — wrap garbage lands outside o_out)
            bit_o = bool((oo == ref[1]).all())
            print(f"  parity vs prod: z={bit_z} o={bit_o} stats={bit_s}")


def main_bwd(H=540, W=960, reps=3, iters=20):
    """Backward-kernel chain variants (stored-O, dot16, odd form, mid layer):

    - prod:   dz -> f32 dzslab scratch store -> bf16 astype value (dW/dX
              operand) -> roll-build odd slab from the f32 scratch
              (ops/fused_stack._bwd_kernel today)
    - noval:  no dz scratch at all — dz stays an f32 VALUE; the bf16 dot
              copy and its odd slab are values too (Mosaic picks the
              materializations)
    - scr16:  dz value -> ONE bf16 scratch store (the dW/dX slices read
              VMEM); odd slab built from the f32 value
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from frame2frame_tpu.ops.fused_stack import (
        ALIGN,
        Geom,
        _body_dma,
        _col_mask,
        _odd_slab,
        _slab_dma,
        default_tile_h,
    )
    from frame2frame_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    g = Geom(H, W // 2, default_tile_h(W // 2))
    _, cmask_slab = _col_mask(g)

    def kern(g_hbm, zi_hbm, zp_hbm, o_hbm, w6t_ref, vecs_ref, cmask_ref,
             da_out, dw2_ref, stats_ref, gslab, zislab, zpslab, oslab,
             *rest, mode):
        if mode == "prod":
            dzslab = rest[0]
            sems = rest[1:]
        elif mode == "scr16":
            dzslab = rest[0]
            sems = rest[1:]
        else:
            dzslab = None
            sems = rest
        sem_g, sem_zi, sem_zp, sem_o = sems
        i = pl.program_id(0)
        n, off, slab = g.n, g.off, g.slab

        def dmas(j, slot):
            return [_slab_dma(g_hbm, gslab, sem_g, j, slot, g),
                    _slab_dma(zi_hbm, zislab, sem_zi, j, slot, g),
                    _body_dma(o_hbm, oslab, sem_o, j, slot, g, n),
                    _body_dma(zp_hbm, zpslab, sem_zp, j, slot, g, n)]

        @pl.when(i == 0)
        def _():
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            stats_ref[:] = jnp.zeros_like(stats_ref)
            for cp in dmas(1, 1):
                cp.start()

        @pl.when((i == 0) | (i == g.T + 1))
        def _():
            da_out[:] = jnp.zeros_like(da_out)

        def compute(slot):
            gs, zis, zps = gslab.at[slot], zislab.at[slot], zpslab.at[slot]
            start = (i * (n // ALIGN) - off // ALIGN) * ALIGN
            v = vecs_ref
            pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
            valid = ((pos >= g.valid_lo) & (pos < g.valid_hi)).astype(
                jnp.float32)
            vm = valid * cmask_ref[:]

            zi = zis[:].astype(jnp.float32)
            relu_mask = ((zi * v[0, :] + v[1, :]) > 0.0).astype(jnp.float32)
            gt = gs[:].astype(jnp.float32) * relu_mask
            dz_val = (v[0, :] * gt + v[2, :] * zi + v[3, :]) * vm

            if mode == "prod":
                dzslab.at[slot][:] = dz_val
                dzv = dzslab.at[slot][:].astype(jnp.bfloat16)
                odzs = _odd_slab(dzslab.at[slot][:]).astype(jnp.bfloat16)
            elif mode == "noval":
                dzv = dz_val.astype(jnp.bfloat16)
                odzs = _odd_slab(dz_val).astype(jnp.bfloat16)
            elif mode == "scr16":
                dzslab.at[slot][:] = dz_val.astype(jnp.bfloat16)
                dzv = dzslab.at[slot]
                odzs = _odd_slab(dz_val).astype(jnp.bfloat16)

            parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
            for t, sh in enumerate(g.odd_shifts):
                parts[t % 3] += lax.dot_general(
                    odzs[off + sh:off + sh + n, :], w6t_ref[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = parts[0] + parts[1] + parts[2]
            da_out[:] = acc.astype(da_out.dtype)

            oap = oslab.at[slot][:]
            for t, sh in enumerate(g.odd_shifts):
                dsl = dzv[off - sh:off - sh + n, :]
                dw2_ref[t] += lax.dot_general(
                    oap, dsl, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            zpc = zps[:].astype(jnp.float32)
            m = cmask_ref[off:off + n, :] * valid[off:off + n, :]
            ap_pos = ((zpc * v[4, :] + v[5, :]) > 0.0).astype(jnp.float32)
            gp = acc * ap_pos * m
            zhp = zpc * v[6, :] + v[7, :]
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

    def make(mode):
        scr = [pltpu.VMEM((2, g.slab, 128), jnp.bfloat16),   # g
               pltpu.VMEM((2, g.slab, 128), jnp.bfloat16),   # zi
               pltpu.VMEM((2, g.n, 128), jnp.bfloat16),      # zp body
               pltpu.VMEM((2, g.n, 128), jnp.bfloat16)]      # o body
        if mode == "prod":
            scr.append(pltpu.VMEM((2, g.slab, 128), jnp.float32))
        elif mode == "scr16":
            scr.append(pltpu.VMEM((2, g.slab, 128), jnp.bfloat16))
        scr += [pltpu.SemaphoreType.DMA((2,))] * 4
        return pl.pallas_call(
            partial(kern, mode=mode),
            grid=(g.T + 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g.slab, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((g.n, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g.tot, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((6, 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((2, 128), jnp.float32),
            ],
            scratch_shapes=scr,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    import jax.numpy as jnp
    rng = np.random.default_rng(1)

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           ).astype(jnp.bfloat16)

    gf, zi, zp, o = (arr((g.tot, 128)) for _ in range(4))
    w6t = arr((6, 128, 128))
    vecs = jnp.asarray(rng.normal(0, 0.5, (8, 128)).astype(np.float32))

    ref = None
    for mode in ("prod", "noval", "scr16"):
        f = make(mode)

        @jax.jit
        def run(gf, zi, zp, o, w6t, vecs, f=f):
            def body(c, _):
                da, dw, st = f(gf, zi, zp, o, w6t, vecs + c * 1e-20,
                               cmask_slab)
                return c + st[0, 0] * 1e-20, None
            return lax.scan(body, 0.0, None, length=iters)[0]

        out = run(gf, zi, zp, o, w6t, vecs)
        float(np.asarray(out))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(gf, zi, zp, o, w6t, vecs)
            float(np.asarray(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"bwd {mode}: {best * 1000:.3f} ms/layer = "
              f"{best / g.T * 1e6:.2f} us/tile", flush=True)

        da, dw, st = jax.jit(f)(gf, zi, zp, o, w6t, vecs, cmask_slab)
        da, dw, st = np.asarray(da), np.asarray(dw), np.asarray(st)
        if ref is None:
            ref = (da, dw, st)
        else:
            print(f"  parity vs prod: da={bool((da == ref[0]).all())} "
                  f"dw={bool((dw == ref[1]).all())} "
                  f"stats={bool((st == ref[2]).all())}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="540x960")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()
    H, W = map(int, args.hw.split("x"))
    if args.bwd:
        main_bwd(H, W, iters=args.iters)
    else:
        main(H, W, iters=args.iters)
