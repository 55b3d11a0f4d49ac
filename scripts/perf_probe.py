"""Performance probe for the 540p online pipeline on the current device.

Measures (1) the full online step per conv implementation, (2) the fused
Pallas kernels standalone, (3) the batched TV-L1 flow — the numbers behind
BASELINE.md's round-2 decomposition. Run on TPU; warm runs are fast via the
persistent compile cache.

Usage: python scripts/perf_probe.py [--impls packed_bf16,fused] [--hw 540x960]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def probe_step(impls, H, W, iters=20):
    import jax.numpy as jnp

    import jax
    from frame2frame_tpu.models.dncnn import init_dncnn
    from frame2frame_tpu.train.online import OnlineDenoiser

    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.random((H, W, 1)).astype(np.float32))
    prev = jnp.asarray(rng.random((H, W, 1)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 1, (H, W, 2)).astype(np.float32))

    for impl in impls:
        model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                      num_layers=17, conv_impl=impl)
        eng = OnlineDenoiser(model, variables, iters=iters)
        d, _ = eng.process_frame(cur, prev, flow)
        float(jnp.sum(d.ravel()[:2]))  # forces completion under the tunnel
        t0 = time.perf_counter()
        for _ in range(3):
            d, _ = eng.process_frame(cur, prev, flow)
        float(jnp.sum(d.ravel()[:2]))
        dt = (time.perf_counter() - t0) / 3
        print(f"step[{impl}]: {dt * 1000:.1f} ms/frame "
              f"({dt * 1000 / iters:.1f} ms/iter)")


def probe_kernels(H, W, tile_h=None):
    import jax.numpy as jnp
    from jax import lax

    import jax
    from frame2frame_tpu.ops.fused_stack import (
        Geom,
        bwd_layer,
        default_tile_h,
        fwd_layer,
        bwd_odd,
        fwd_odd,
    )

    f_odd, b_odd = fwd_odd(), bwd_odd()

    th = tile_h or default_tile_h(W // 2)
    print(f"-- kernels at tile_h={th} --")
    g = Geom(H, W // 2, th)
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)

    zprev, zi, gg = mk((g.tot, 128)), mk((g.tot, 128)), mk((g.tot, 128))
    w2f = mk((6 if f_odd else 9, 128, 128))
    w2b = mk((6 if b_odd else 9, 128, 128))
    s_vec = jnp.ones((128,), jnp.float32)
    b_vec = jnp.zeros((128,), jnp.float32)
    vecs = jnp.asarray(
        rng.standard_normal((8, 128)).astype(np.float32)) * 0.1

    @jax.jit
    def run_fwd(zprev, w2, s_vec, b_vec):
        def body(c, _):
            _, st = fwd_layer(zprev, w2, s_vec + c, b_vec, g, odd=f_odd)
            return c + st[0, 0] * 1e-12, None
        return lax.scan(body, 0.0, None, length=20)[0]

    @jax.jit
    def run_fwd_emit(zprev, w2, s_vec, b_vec):
        def body(c, _):
            _, o, st = fwd_layer(zprev, w2, s_vec + c, b_vec, g, odd=True,
                                 emit_act=True)
            return c + st[0, 0] * 1e-12 + o[0, 0].astype(jnp.float32) * 1e-12, None
        return lax.scan(body, 0.0, None, length=20)[0]

    @jax.jit
    def run_fwd_eval(zprev, w2, s_vec, b_vec):
        def body(c, _):
            z, = fwd_layer(zprev, w2, s_vec + c, b_vec, g, odd=f_odd,
                           emit_stats=False)
            return c + z[0, 0].astype(jnp.float32) * 1e-12, None
        return lax.scan(body, 0.0, None, length=20)[0]

    @jax.jit
    def run_bwd(gg, zi, zprev, w2, vecs):
        def body(c, _):
            _, dw2, _ = bwd_layer(gg, zi, zprev, w2, vecs + c * 1e-12, g,
                                  odd=b_odd)
            return c + dw2[0, 0, 0] * 1e-12, None
        return lax.scan(body, 0.0, None, length=20)[0]

    o_in = mk((g.tot, 128))

    @jax.jit
    def run_bwd_stored(gg, zi, zprev, o_in, w2, vecs):
        def body(c, _):
            _, dw2, _ = bwd_layer(gg, zi, zprev, w2, vecs + c * 1e-12, g,
                                  odd=True, o_flat=o_in)
            return c + dw2[0, 0, 0] * 1e-12, None
        return lax.scan(body, 0.0, None, length=20)[0]

    w2f6 = w2f if f_odd else mk((6, 128, 128))
    w2b6 = w2b if b_odd else mk((6, 128, 128))
    for name, fn, args in [
            (f"fwd_layer[{'odd' if f_odd else 'even'}]", run_fwd,
             (zprev, w2f, s_vec, b_vec)),
            ("fwd_layer[odd,emit_act]", run_fwd_emit,
             (zprev, w2f6, s_vec, b_vec)),
            (f"fwd_layer[{'odd' if f_odd else 'even'},eval]", run_fwd_eval,
             (zprev, w2f, s_vec, b_vec)),
            (f"bwd_layer[{'odd' if b_odd else 'even'}]", run_bwd,
             (gg, zi, zprev, w2b, vecs)),
            ("bwd_layer[odd,stored_o]", run_bwd_stored,
             (gg, zi, zprev, o_in, w2b6, vecs))]:
        try:
            o = fn(*args)
            float(np.asarray(o))
            t0 = time.perf_counter()
            for _ in range(3):
                o = fn(*args)
            float(np.asarray(o))
            print(f"{name}: {(time.perf_counter() - t0) / 3 / 20 * 1000:.3f} "
                  f"ms/layer", flush=True)
        except Exception as e:  # e.g. VMEM overflow at a probed tile_h
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def probe_serving(H, W, reps=40, B=8):
    """Inference-only serving fps: per-frame chain and stacked batch, for
    both eval kernel implementations (affine-chained vs act-chained; see
    models/fused_apply._eval_impl)."""
    import os

    import jax
    import jax.numpy as jnp

    from frame2frame_tpu.models.dncnn import init_dncnn
    from frame2frame_tpu.train.online import OnlineDenoiser

    rng = np.random.default_rng(0)
    model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                  num_layers=17)
    eng = OnlineDenoiser(model, variables, iters=1)
    frame = jnp.asarray(rng.random((H, W, 1)).astype(np.float32))
    batch = jnp.asarray(rng.random((B, H, W, 1)).astype(np.float32))

    prior = os.environ.get("F2F_EVAL")
    for impl in ("affine", "act"):
        os.environ["F2F_EVAL"] = impl
        try:
            np.asarray(eng.denoise_only(frame))
            t0 = time.perf_counter()
            for _ in range(reps):
                d = eng.denoise_only(frame)
            np.asarray(d)
            fps1 = reps / (time.perf_counter() - t0)

            np.asarray(eng.denoise_batch(batch, route="stacked"))
            t0 = time.perf_counter()
            for _ in range(max(1, reps // B)):
                db = eng.denoise_batch(batch, route="stacked")
            np.asarray(db)
            fpsb = max(1, reps // B) * B / (time.perf_counter() - t0)
            print(f"serving[{impl}]: per-frame {fps1:.1f} fps, "
                  f"stacked B={B} {fpsb:.1f} fps", flush=True)
        except Exception as e:
            print(f"serving[{impl}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            if prior is None:
                os.environ.pop("F2F_EVAL", None)
            else:
                os.environ["F2F_EVAL"] = prior


def probe_flow(H, W, K=8):
    import jax.numpy as jnp

    from frame2frame_tpu.flow.tvl1 import DENOISING_PARAMS, make_batched_tvl1

    rng = np.random.default_rng(0)
    solver = make_batched_tvl1(W, H, **DENOISING_PARAMS)
    I1 = jnp.asarray(rng.random((K, H, W)).astype(np.float32)) * 255
    I0 = jnp.asarray(rng.random((K, H, W)).astype(np.float32)) * 255
    fl = solver(I1, I0)
    float(jnp.sum(fl.ravel()[:2]))
    t0 = time.perf_counter()
    for _ in range(3):
        fl = solver(I1, I0)
    float(jnp.sum(fl.ravel()[:2]))
    print(f"tvl1 batch{K}: {(time.perf_counter() - t0) / 3 / K * 1000:.1f} "
          f"ms/flow")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="packed_bf16,fused")
    ap.add_argument("--hw", default="540x960")
    ap.add_argument("--tile-h", default=None,
                    help="comma list of tile heights for the kernel probe "
                         "(default: the production default_tile_h)")
    ap.add_argument("--kernels-only", action="store_true")
    ap.add_argument("--step-only", action="store_true")
    ap.add_argument("--serving-only", action="store_true")
    args = ap.parse_args(argv)
    H, W = (int(v) for v in args.hw.split("x"))

    from frame2frame_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if args.serving_only:
        probe_serving(H, W)
        return
    if not args.kernels_only:
        probe_step(args.impls.split(","), H, W)
    if args.step_only:
        return
    ths = ([int(t) for t in args.tile_h.split(",")] if args.tile_h
           else [None])
    for th in ths:
        probe_kernels(H, W, tile_h=th)
    if not args.kernels_only:
        probe_flow(H, W)


if __name__ == "__main__":
    main()
