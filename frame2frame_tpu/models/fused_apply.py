"""DnCNN training-mode forward on the fused Pallas layer pipeline.

Drop-in functional equivalent of ``model.apply(variables, x, train=True,
mutable=["batch_stats"])`` for the packed DnCNN (models/dncnn.py) — same
parameter pytree, same BatchNorm running-statistics update (torch
BatchNorm2d: momentum 0.1, biased batch variance), same residual/noise
output conventions — but the 15 mid layers execute as fused Pallas kernels
(ops/fused_stack.py) instead of an XLA conv graph: measured 59 -> 35.5 ms
per 540p fine-tune iteration, 1.25 fps end-to-end (the reference hot loop,
blind_denoising.py:216-222; decomposition in BASELINE.md).

Activations are stored bfloat16 between layers (the established bf16-chain
accuracy mode: ~1e-3 pixel deviation at 17 layers, PSNR trajectory within
the BASELINE.json float-tolerance oracle).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops.fused_stack import default_tile_h, fused_mid_stack
from ..ops.packed import conv3x3_packed_bf16, pack_image, unpack_image

BN_MOMENTUM = 0.9  # flax convention: new = m*old + (1-m)*batch (torch 0.1)


def _make_end_conv(store_dtype):
    """The C<->64 boundary convs: bf16 custom-VJP path in production,
    plain packed conv in the f32 oracle-test mode. Shared by the train and
    eval forwards so their semantics cannot drift."""
    if store_dtype == jnp.bfloat16:
        def end_conv(x2, w):
            return conv3x3_packed_bf16(x2.astype(jnp.bfloat16), w)
    else:
        from ..ops.packed import conv3x3_packed as _cp

        def end_conv(x2, w):
            return _cp(x2.astype(store_dtype), w)
    return end_conv


def _geom_ok(model, H, W):
    """Shared tile-geometry precondition of the fused pipelines: 64
    features, even width, ALIGN-divisible tile rows, tall-enough frames,
    a real mid-stack. Returns (W2, tile_h) or None."""
    from ..ops.fused_stack import ALIGN

    if model.features != 64 or W % 2:
        return None
    W2 = W // 2
    th = default_tile_h(W2)
    if (th * (W2 + 2)) % ALIGN != 0 or H < th or model.num_layers < 3:
        return None
    return W2, th


def can_fuse(model, x_shape, conv=None):
    """The fused pipeline covers the standard packed DnCNN: batch 1, 64
    features, even width, tall-enough frames for the tile geometry, and a
    backward-kernel scratch footprint that fits VMEM (very wide frames —
    ~4K — exceed it and fall back to the XLA path)."""
    B, H, W, _ = x_shape
    if B != 1:
        return False
    geom = _geom_ok(model, H, W)
    if geom is None:
        return False
    # backward-kernel scratch must stay under the 100 MB scoped VMEM cap with
    # headroom for accumulators; the byte accounting lives next to the kernel
    # (Geom.bwd_scratch_bytes) so this guard cannot drift from it
    from ..ops.fused_stack import Geom

    W2, th = geom
    g = Geom(H, W2, th)
    return g.bwd_scratch_bytes(conv=conv) < 88 * 1024 * 1024


def can_fuse_batch(model, x_shape, hbm_budget_bytes=12 * 1024 ** 3,
                   eval_impl=None):
    """Feasibility of the STACKED batched-serving layout
    (``fused_eval_apply_batch``): the whole (B, H, W) batch becomes one flat
    ((B*T_f+2)*n, 128) activation per live tensor, so beyond the single-frame
    tile-geometry checks the stacked HBM footprint must fit. The eval chain
    keeps ~2 live flat tensors (current + next layer, double-buffered by
    XLA) plus the packed input/output; guard at 4x one flat tensor against
    ``hbm_budget_bytes`` (v5e: 16 GB minus weights/workspace headroom).
    The per-element size follows the ACTIVE chain dtype (the act impl's f32
    chain doubles it). Callers fall back to the per-frame route when this
    fails — the serving analogue of the reference's chunked-inference
    memory discipline (test.py:172-175)."""
    B, H, W, _ = x_shape
    geom = _geom_ok(model, H, W)
    if geom is None:
        return False
    from ..ops.fused_stack import Geom, stack_tiles

    W2, th = geom
    T_f = stack_tiles(H, th)
    g = Geom(B * T_f * th, W2, th)
    if (_eval_impl(eval_impl) == "act"
            and _eval_chain_dtype(eval_impl) == jnp.float32):
        elem = 4
    else:
        elem = 2  # bf16 store dtype
    flat_bytes = g.tot * 128 * elem
    return 4 * flat_bytes < hbm_budget_bytes


def fused_train_apply(model, params, batch_stats, x, store_dtype=jnp.bfloat16,
                      conv=None):
    """Training-mode DnCNN forward with batch-stat updates.

    x: (1, H, W, C). Returns (out, new_batch_stats) where ``out`` matches
    the model's output convention (noise, or x - noise when
    ``model.residual``). ``conv``: formulation override (fused_stack
    conv_mode; the F2F_CONV env var wins).
    """
    B, H, W, C = x.shape
    nmid = model.num_layers - 2
    end_conv = _make_end_conv(store_dtype)
    x2 = pack_image(x)

    a1 = jax.nn.relu(end_conv(x2, params["conv_in"]["kernel"]))
    ws = jnp.stack([params[f"conv_{i}"]["kernel"] for i in range(nmid)])
    gammas = jnp.stack([params[f"bn_{i}"]["scale"] for i in range(nmid)])
    betas = jnp.stack([params[f"bn_{i}"]["bias"] for i in range(nmid)])

    tile_h = default_tile_h(W // 2)
    a_out, means, vars_ = fused_mid_stack(ws, gammas, betas, a1, H, tile_h,
                                          store_dtype, conv)

    noise2 = end_conv(a_out, params["conv_out"]["kernel"])
    noise = unpack_image(noise2).astype(jnp.float32)

    # copy unrecognized batch_stats entries through unchanged so callers with
    # extra collections don't silently lose them
    new_bs = {k: v for k, v in batch_stats.items()}
    for i in range(nmid):
        old = batch_stats[f"bn_{i}"]
        m = jax.lax.stop_gradient(means[i])
        v = jax.lax.stop_gradient(vars_[i])
        new_bs[f"bn_{i}"] = {
            "mean": BN_MOMENTUM * old["mean"] + (1 - BN_MOMENTUM) * m,
            "var": BN_MOMENTUM * old["var"] + (1 - BN_MOMENTUM) * v,
        }

    out = x - noise if model.residual else noise
    return out, new_bs


def _eval_impl(eval_impl=None):
    """Eval-forward implementation in {"affine", "act"}.

    - "affine" (default until the act variant is re-ranked on hardware):
      activations chain as RAW conv outputs; each kernel applies the previous
      layer's eval BN affine + ReLU + masking per element (stats-free
      variant of the training kernel).
    - "act": activations chain POST-activation; the eval BN scale is folded
      into the conv weights and bias+ReLU+mask ride the epilogue — the
      consumer's per-element work reduces to the odd-slab build
      (fused_stack.fwd_layer_eval). The chain storage dtype comes from the
      token suffix ("act-f32"/"act-bf16") or the F2F_EVAL_DTYPE env var
      (bf16 default; f32 trades 2x DMA for skipping the upcast). Callers
      that jit over the impl (OnlineDenoiser) use the SUFFIXED token as the
      static key, so a dtype flip retraces rather than silently reusing the
      other dtype's executable.

    The ``F2F_EVAL`` env var (probe override) wins over the argument.
    """
    tok = os.environ.get("F2F_EVAL") or eval_impl or "affine"
    assert tok in ("affine", "act", "act-f32", "act-bf16"), tok
    return "affine" if tok == "affine" else "act"


def _eval_chain_dtype(eval_impl=None):
    tok = os.environ.get("F2F_EVAL") or eval_impl or ""
    if tok.endswith("-f32"):
        return jnp.float32
    if tok.endswith("-bf16"):
        return jnp.bfloat16
    return (jnp.float32 if os.environ.get("F2F_EVAL_DTYPE") == "f32"
            else jnp.bfloat16)


def _eval_layer_affine(params, batch_stats, i):
    from ..ops.fused_stack import _affine_from_stats

    return _affine_from_stats(
        batch_stats[f"bn_{i}"]["mean"], batch_stats[f"bn_{i}"]["var"],
        params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"])[:2]


def _act_eval_mid_stack(model, params, batch_stats, a1, g, to_flat_fn,
                        from_flat_fn, conv=None, stack=None, eval_impl=None):
    """The act-space eval mid-stack shared by the single-frame and stacked
    serving paths (see _eval_impl)."""
    from ..ops.fused_stack import (
        fwd_layer_eval,
        fwd_odd,
        pack_kernel_flat,
        pack_kernel_odd,
        tile_vec,
    )

    odd = fwd_odd(conv)
    nmid = model.num_layers - 2
    cur = to_flat_fn(a1.astype(_eval_chain_dtype(eval_impl)))
    for i in range(nmid):
        s64, b64 = _eval_layer_affine(params, batch_stats, i)
        kern = params[f"conv_{i}"]["kernel"] * s64[None, None, None, :]
        w2 = pack_kernel_odd(kern) if odd else pack_kernel_flat(kern)
        cur, = fwd_layer_eval(cur, w2, tile_vec(b64), g, odd=odd, stack=stack)
    return from_flat_fn(cur.astype(jnp.float32))


def fused_eval_apply(model, params, batch_stats, x, store_dtype=jnp.bfloat16,
                     conv=None, eval_impl=None):
    """Eval-mode DnCNN forward on the fused pipeline (running statistics,
    no stat updates) — the final per-frame denoise (blind_denoising.py:229).

    Runs the STATS-FREE forward kernel variant (emit_stats=False): eval-mode
    BN uses running statistics, so the training kernel's per-tile batch-stat
    masking and reductions are dead work here — dropped entirely (the
    round-3 verdict's stats-free eval kernel). ``eval_impl`` selects the
    affine-chained vs act-chained kernels (see _eval_impl). Costs one extra
    Mosaic program per geometry (persistent-compile-cache amortized).
    """
    from ..ops.fused_stack import (
        Geom,
        _affine_from_stats,
        from_flat,
        fwd_layer,
        pack_kernel_flat,
        pack_kernel_odd,
        tile_vec,
        to_flat,
        fwd_odd,
    )

    B, H, W, C = x.shape
    nmid = model.num_layers - 2
    end_conv = _make_end_conv(store_dtype)
    odd = fwd_odd(conv)

    x2 = pack_image(x)
    a1 = jax.nn.relu(end_conv(x2, params["conv_in"]["kernel"]))
    tile_h = default_tile_h(W // 2)
    g = Geom(H, W // 2, tile_h)

    if _eval_impl(eval_impl) == "act":
        a_out = _act_eval_mid_stack(
            model, params, batch_stats, a1, g,
            lambda a: to_flat(a, g), lambda f: from_flat(f, g), conv=conv,
            eval_impl=eval_impl)
    else:
        cur = to_flat(a1.astype(store_dtype), g)
        s_vec = jnp.ones((128,), jnp.float32)
        b_vec = jnp.zeros((128,), jnp.float32)
        for i in range(nmid):
            kern = params[f"conv_{i}"]["kernel"]
            w2 = pack_kernel_odd(kern) if odd else pack_kernel_flat(kern)
            cur, = fwd_layer(cur, w2, s_vec, b_vec, g, odd=odd,
                             emit_stats=False)
            s64, b64, _ = _affine_from_stats(
                batch_stats[f"bn_{i}"]["mean"], batch_stats[f"bn_{i}"]["var"],
                params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"])
            s_vec, b_vec = tile_vec(s64), tile_vec(b64)

        a_out = from_flat(
            jnp.maximum(cur.astype(jnp.float32) * s_vec + b_vec, 0.0), g)
    noise2 = end_conv(a_out, params["conv_out"]["kernel"])
    noise = unpack_image(noise2).astype(jnp.float32)
    return x - noise if model.residual else noise


def fused_eval_apply_batch(model, params, batch_stats, x,
                           store_dtype=jnp.bfloat16, conv=None,
                           eval_impl=None):
    """Eval-mode DnCNN forward over a BATCH of frames on the fused pipeline —
    the serving path (denoise many adapted frames / a whole clip at once).

    Eval-mode BatchNorm uses running statistics, so frames are independent:
    the batch stacks vertically into one flat layout (frame k on tiles
    [k*T_f, (k+1)*T_f), trailing rows of each block zeroed) and the whole
    stack runs through ONE kernel chain per layer. Frame isolation is
    exact: the in-kernel stack mask (ops/fused_stack.fwd_layer(stack=..))
    zeroes the >= 1 separator rows every tile reads its halos from, the same
    mechanism that isolates the single-frame H padding.

    Measured (v5e, 540p, B=8, batch handed as one device array): 36 fps vs
    29 fps for slicing the batch and dispatching the single-frame chain per
    frame — the stack mask adds per-element VPU work to every tile of the
    VPU-bound kernels, but the slice/restack overhead of the per-frame
    route costs more, so this is ``OnlineDenoiser.denoise_batch``'s
    default. A caller already holding separate frames is fastest looping
    the single-frame chain directly (80 fps; launches hidden by JAX async
    dispatch).

    x: (B, H, W, C). Returns (B, H, W, C) denoised (model output convention).
    """
    from ..ops.fused_stack import (
        Geom,
        _affine_from_stats,
        from_flat_stack,
        fwd_layer,
        pack_kernel_flat,
        pack_kernel_odd,
        stack_tiles,
        tile_vec,
        to_flat_stack,
        fwd_odd,
    )

    B, H, W, C = x.shape
    nmid = model.num_layers - 2
    end_conv = _make_end_conv(store_dtype)
    odd = fwd_odd(conv)

    x2 = pack_image(x)  # (B, H, W2, 2C)
    a1 = jax.nn.relu(end_conv(x2, params["conv_in"]["kernel"]))
    tile_h = default_tile_h(W // 2)
    T_f = stack_tiles(H, tile_h)
    g = Geom(B * T_f * tile_h, W // 2, tile_h)
    stack = (T_f, H)

    if _eval_impl(eval_impl) == "act":
        # act-chained kernels also drop the per-tile in-dot stack mask: the
        # producer's epilogue already zeroed the separator rows every halo
        # reads, so operands need no masking at all
        a_out = _act_eval_mid_stack(
            model, params, batch_stats, a1, g,
            lambda a: to_flat_stack(a, g, T_f),
            lambda f: from_flat_stack(f, H, g, T_f), conv=conv, stack=stack,
            eval_impl=eval_impl)
    else:
        cur = to_flat_stack(a1.astype(store_dtype), g, T_f)
        s_vec = jnp.ones((128,), jnp.float32)
        b_vec = jnp.zeros((128,), jnp.float32)
        for i in range(nmid):
            kern = params[f"conv_{i}"]["kernel"]
            w2 = pack_kernel_odd(kern) if odd else pack_kernel_flat(kern)
            cur, = fwd_layer(cur, w2, s_vec, b_vec, g, odd=odd, stack=stack,
                             emit_stats=False)
            s64, b64, _ = _affine_from_stats(
                batch_stats[f"bn_{i}"]["mean"], batch_stats[f"bn_{i}"]["var"],
                params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"])
            s_vec, b_vec = tile_vec(s64), tile_vec(b64)

        a_out = from_flat_stack(
            jnp.maximum(cur.astype(jnp.float32) * s_vec + b_vec, 0.0),
            H, g, T_f)
    noise2 = end_conv(a_out, params["conv_out"]["kernel"])
    noise = unpack_image(noise2).astype(jnp.float32)
    return x - noise if model.residual else noise


# ---------------------------------------------------------------------------
# spatially sharded variants (ops/fused_spatial.py): single large frames
# H-split across a ``space`` mesh axis; the boundary C<->64 convs stay XLA
# ops so the SPMD partitioner shards them (with automatic halos), while the
# mid-stack runs the shard_map'd fused engine


def _spatial_pad(x, mesh):
    from ..ops.fused_spatial import pad_h

    B, H, W, C = x.shape
    th = default_tile_h(W // 2)
    Hp = pad_h(H, mesh.shape["space"], th)
    return jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0), (0, 0))), th


def fused_train_apply_spatial(model, params, batch_stats, x, mesh,
                              store_dtype=jnp.bfloat16, conv=None):
    """``fused_train_apply`` with the mid-stack H-sharded over ``mesh``'s
    ``space`` axis — exact single-chip semantics (sync-BN statistics)."""
    from ..ops.fused_spatial import fused_mid_stack_spatial

    B, H, W, C = x.shape
    nmid = model.num_layers - 2
    end_conv = _make_end_conv(store_dtype)
    xp, tile_h = _spatial_pad(x, mesh)
    x2 = pack_image(xp)

    a1 = jax.nn.relu(end_conv(x2, params["conv_in"]["kernel"]))
    # zero the pad rows: the primal is unaffected (the mid-stack's validity
    # window already excludes them), but the multiply also zeroes the
    # COTANGENT there, keeping boundary-leakage garbage in the sharded
    # backward out of conv_in's weight gradient
    row_ok = (jnp.arange(xp.shape[1]) < H)[None, :, None, None]
    a1 = jnp.where(row_ok, a1, jnp.zeros((), a1.dtype))

    ws = jnp.stack([params[f"conv_{i}"]["kernel"] for i in range(nmid)])
    gammas = jnp.stack([params[f"bn_{i}"]["scale"] for i in range(nmid)])
    betas = jnp.stack([params[f"bn_{i}"]["bias"] for i in range(nmid)])

    a_out, means, vars_ = fused_mid_stack_spatial(
        ws, gammas, betas, a1, H, tile_h, store_dtype, mesh, conv)
    a_out = a_out[:, :H]

    noise2 = end_conv(a_out, params["conv_out"]["kernel"])
    noise = unpack_image(noise2).astype(jnp.float32)

    new_bs = {k: v for k, v in batch_stats.items()}
    for i in range(nmid):
        old = batch_stats[f"bn_{i}"]
        m = jax.lax.stop_gradient(means[i])
        v = jax.lax.stop_gradient(vars_[i])
        new_bs[f"bn_{i}"] = {
            "mean": BN_MOMENTUM * old["mean"] + (1 - BN_MOMENTUM) * m,
            "var": BN_MOMENTUM * old["var"] + (1 - BN_MOMENTUM) * v,
        }

    out = x - noise if model.residual else noise
    return out, new_bs


def fused_eval_apply_spatial(model, params, batch_stats, x, mesh,
                             store_dtype=jnp.bfloat16, conv=None,
                             eval_impl=None):
    """``fused_eval_apply`` H-sharded over ``mesh``'s ``space`` axis."""
    from ..ops.fused_spatial import eval_mid_stack_spatial
    from ..ops.fused_stack import _affine_from_stats, tile_vec

    B, H, W, C = x.shape
    nmid = model.num_layers - 2
    end_conv = _make_end_conv(store_dtype)
    xp, tile_h = _spatial_pad(x, mesh)
    x2 = pack_image(xp)
    a1 = jax.nn.relu(end_conv(x2, params["conv_in"]["kernel"]))
    # zero conv leakage in the H-pad rows: the act-chained kernels do no
    # operand masking (their inputs are post-activation, already masked by
    # the producer epilogue), so the stack input must arrive pre-masked too
    # (the affine-chained kernels mask operands and don't care)
    row_ok = (jnp.arange(xp.shape[1]) < H)[None, :, None, None]
    a1 = jnp.where(row_ok, a1, jnp.zeros((), a1.dtype))

    ws = jnp.stack([params[f"conv_{i}"]["kernel"] for i in range(nmid)])
    svecs = [jnp.ones((128,), jnp.float32)]
    bvecs = [jnp.zeros((128,), jnp.float32)]
    for i in range(nmid):
        s64, b64, _ = _affine_from_stats(
            batch_stats[f"bn_{i}"]["mean"], batch_stats[f"bn_{i}"]["var"],
            params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"])
        svecs.append(tile_vec(s64))
        bvecs.append(tile_vec(b64))

    a_out = eval_mid_stack_spatial(ws, jnp.stack(svecs), jnp.stack(bvecs),
                                   a1, H, tile_h, store_dtype, mesh,
                                   conv, eval_impl=eval_impl)[:, :H]
    noise2 = end_conv(a_out, params["conv_out"]["kernel"])
    noise = unpack_image(noise2).astype(jnp.float32)
    return x - noise if model.residual else noise
