"""Experiment: decompose the fused forward kernel's per-tile cost (VPU vs
MXU vs DMA) and test cross-tile software pipelining.

Modes (same DMA/double-buffer structure as ops/fused_stack._fwd_kernel):
- full:     odd-slab build + 6 dots + stats (the production kernel's work)
- nodots:   odd-slab build + stats only            -> VPU + DMA cost
- minbuild: cast-only slab + 6 dots + stats        -> MXU + DMA cost
- pipe:     build slab for tile i, dots on tile i-1's slab (independent ->
            the compiler may co-issue VPU and MXU); one extra grid step

If pipe ~= max(nodots, minbuild) the production kernels should adopt the
structure; if pipe ~= full, Mosaic serializes anyway and the VPU op count
is the only lever.
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(H=540, W=960):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from frame2frame_tpu.ops.fused_stack import (
        ALIGN,
        Geom,
        _col_mask,
        _slab_dma,
        default_tile_h,
    )
    from frame2frame_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    g = Geom(H, W // 2, default_tile_h(W // 2))

    def kern(zprev_hbm, w6_ref, vecs_ref, z_out, stats_ref, zslab, aslab,
             sem, *, mode):
        i = pl.program_id(0)
        n, off, slab = g.n, g.off, g.slab
        pipe = mode == "pipe"
        last = g.T + (2 if pipe else 1)

        @pl.when(i == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)
            _slab_dma(zprev_hbm, zslab, sem, 1, 1, g).start()

        @pl.when((i == 0) | (i >= last))
        def _():
            z_out[:] = jnp.zeros_like(z_out)

        def build(slot, i_build):
            zs, as_ = zslab.at[slot], aslab.at[slot]
            start = (i_build * (n // ALIGN) - off // ALIGN) * ALIGN
            s = vecs_ref[0, :]
            b = vecs_ref[1, :]
            pos = lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start
            valid = ((pos >= g.valid_lo) & (pos < g.valid_hi)).astype(jnp.float32)
            if mode == "minbuild":
                as_[:] = zs[:].astype(jnp.float32)
                return
            zr0 = pltpu.roll(zs[:].astype(jnp.float32), 64, axis=1)
            zr1 = pltpu.roll(zr0, slab - 1, axis=0)
            lane = lax.broadcasted_iota(jnp.int32, (slab, 128), 1)
            zodd = jnp.where(lane < 64, zr0, zr1)
            pos2 = (lax.broadcasted_iota(jnp.int32, (slab, 128), 0) + start
                    + (lane >= 64).astype(jnp.int32))
            col = lax.rem(pos2, g.wpad)
            m2 = ((pos2 >= g.valid_lo) & (pos2 < g.valid_hi)
                  & (col != 0) & (col != g.wpad - 1)).astype(jnp.float32)
            as_[:] = jnp.maximum(zodd.astype(jnp.float32) * s + b, 0.0) * m2

        def dots(slot, i_out):
            as_ = aslab.at[slot]
            start = (i_out * (n // ALIGN) - off // ALIGN) * ALIGN
            pos = lax.broadcasted_iota(jnp.int32, (n, 1), 0) + start + off
            valid = ((pos >= g.valid_lo) & (pos < g.valid_hi)).astype(jnp.float32)
            if mode == "nodots":
                acc = as_[off:off + n, :] + as_[off + 1:off + 1 + n, :]
            else:
                parts = [jnp.zeros((n, 128), jnp.float32) for _ in range(3)]
                for t, sh in enumerate(g.odd_shifts):
                    xs = as_[off + sh:off + sh + n, :]
                    parts[t % 3] += lax.dot_general(
                        xs, w6_ref[t], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                acc = parts[0] + parts[1] + parts[2]
            z_out[:] = acc.astype(z_out.dtype)
            stats_ref[0, :] += jnp.sum(acc * valid, axis=0)
            stats_ref[1, :] += jnp.sum(acc * acc * valid, axis=0)

        if not pipe:
            for slot in (0, 1):
                @pl.when((i > 0) & (i < g.T + 1) & (lax.rem(i, 2) == slot))
                def _(slot=slot):
                    @pl.when(i < g.T)
                    def _():
                        _slab_dma(zprev_hbm, zslab, sem, i + 1, 1 - slot, g).start()
                    _slab_dma(zprev_hbm, zslab, sem, i, slot, g).wait()
                    build(slot, i)
                    dots(slot, i)
        else:
            # step i: dots on tile i-1 (slab built last step, other buffer)
            # then build tile i's slab — independent work, may co-issue
            for slot in (0, 1):
                @pl.when((i > 0) & (lax.rem(i, 2) == slot))
                def _(slot=slot):
                    # tiles are 1..T: the last grid step (i = T+2) must not
                    # dot a slab that was never built for tile T+1
                    @pl.when((i > 1) & (i <= g.T + 1))
                    def _():
                        dots(1 - slot, i - 1)

                    @pl.when(i <= g.T)
                    def _():
                        @pl.when(i < g.T)
                        def _():
                            _slab_dma(zprev_hbm, zslab, sem, i + 1,
                                      1 - slot, g).start()
                        _slab_dma(zprev_hbm, zslab, sem, i, slot, g).wait()
                        build(slot, i)

    def make(mode):
        pipe = mode == "pipe"
        grid = g.T + (3 if pipe else 2)

        def zmap(i):
            if pipe:
                return (jnp.maximum(i - 1, 0), 0)
            return (i, 0)

        return pl.pallas_call(
            partial(kern, mode=mode),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((g.n, 128), zmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g.tot, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((2, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, g.slab, 128), jnp.bfloat16),
                pltpu.VMEM((2, g.slab, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((g.tot, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w6 = jnp.asarray(rng.standard_normal((6, 128, 128)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    vecs = jnp.asarray(np.stack([np.full(128, 1.01, np.float32),
                                 np.full(128, 0.02, np.float32)]))

    outs = {}
    for mode in ("full", "nodots", "minbuild", "pipe"):
        f = make(mode)

        @jax.jit
        def run(z, w6, vecs, f=f):
            def body(c, _):
                zo, st = f(z, w6, vecs + c * 1e-20)
                return c + st[0, 0] * 1e-20, None
            return lax.scan(body, 0.0, None, length=20)[0]

        from jax import lax
        o = run(z, w6, vecs)
        float(np.asarray(o))
        t0 = time.perf_counter()
        for _ in range(3):
            o = run(z, w6, vecs)
        float(np.asarray(o))
        dt = (time.perf_counter() - t0) / 3 / 20
        outs[mode] = dt
        print(f"{mode}: {dt * 1000:.3f} ms/layer = "
              f"{dt / g.T * 1e6:.2f} us/tile", flush=True)

    # parity: pipe must produce the same z_out as full
    zf, sf = make("full")(z, w6, vecs)
    zp, sp = make("pipe")(z, w6, vecs)
    print("pipe parity:",
          bool(jnp.all(zf == zp)), bool(jnp.allclose(sf, sp, rtol=1e-5)))


if __name__ == "__main__":
    main()
