"""Spatially sharded fused Pallas pipeline: the DnCNN mid-stack H-split
across a ``space`` mesh axis under ``shard_map``.

``parallel/spatial.py`` scales single large frames by letting XLA's SPMD
partitioner shard the *XLA* conv path; this module gives the same H-split
scaling to the **fused Pallas engine** (ops/fused_stack.py) — the 2x-faster
production path — which is opaque to the partitioner and needs its
communication written by hand:

- **Halo exchange**: each shard holds its body tiles of the flat pair-packed
  layout plus one head and one tail tile. Between layers the neighbors'
  boundary tiles are fetched with ``lax.ppermute`` (raw pre-affine ``z``
  rows — the BN affine is per-channel, so it commutes with the row moves and
  is applied by the consumer kernel exactly as on one chip). ``ppermute``
  leaves zeros where no source exists, which is precisely the zero-pad tile
  the true image boundary needs.
- **Global statistics**: per-layer BN (sum, sum-sq) accumulators, the
  backward per-channel reductions (dgamma/dbeta) and dW are ``lax.psum``
  over the axis, so batch statistics and gradients are *exactly* the
  single-chip values (sync-BN), not per-shard approximations.
- **Shard-local validity**: the kernels' row-validity window becomes a pair
  of SMEM scalars computed from ``lax.axis_index`` (fused_stack's
  ``valid_bounds``) — one compiled SPMD program serves every shard, and each
  shard's tiles see exactly the slab contents and masks the single-chip
  program would, so per-tile outputs match bit-for-bit and the psums
  reconstruct the global reductions.

The reference has no model/spatial parallelism (SURVEY.md §2.4); its closest
analogue is approximate host-side spatial chunking (test.py:172-175). This
is the exact TPU-native version for frames too large (or too slow) for one
chip, on the engine that carries production throughput.

Requires global H padded so every shard holds whole tiles:
``Hp % (n_shards * tile_h) == 0`` (``pad_h``); validity bounds carry the
true H so pad rows never touch statistics or outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .fused_stack import (
    Geom,
    _affine_from_stats,
    _io_t,
    bwd_layer,
    fold_dw2,
    fold_dw6,
    fold_vec,
    from_flat,
    fwd_layer,
    fwd_layer_eval,
    pack_kernel_flat,
    pack_kernel_odd,
    pack_kernel_odd_bwd,
    tile_vec,
    to_flat,
    bwd_odd,
    fwd_odd,
    store_odd_act,
    dot_bf16,
    EPS,
)

AXIS = "space"


def pad_h(H, n_shards, tile_h):
    """Smallest padded height splitting into whole tiles per shard."""
    q = n_shards * tile_h
    return -(-H // q) * q


def _exchange(flat, g, n_shards):
    """Fill the halo regions of the head/tail tiles with the neighbors'
    boundary body rows.

    flat: ((T+2)*n, 128) local layout, body rows at [n, n + T*n). The
    kernels' slab DMAs only reach ``off`` rows past the body ([n - off, n)
    of the head tile and [n + R, n + R + off) of the tail), so exactly those
    rows ride the ppermute — ~off/n of a full tile (at 540p, 496 of 3856
    rows per direction per layer). Shard 0's head and the last shard's tail
    stay zero (ppermute default) — the true image boundary's zero-pad tile.
    """
    n, R, off = g.n, g.T * g.n, g.off
    if n_shards == 1:
        return flat
    down = [(i, i + 1) for i in range(n_shards - 1)]
    up = [(i, i - 1) for i in range(1, n_shards)]
    # left nbr's last off body rows -> my head tile's tail; right nbr's
    # first off body rows -> my tail tile's head
    head = lax.ppermute(flat[n + R - off:n + R], AXIS, down)
    tail = lax.ppermute(flat[n:n + off], AXIS, up)
    zpad = jnp.zeros((n - off, flat.shape[1]), flat.dtype)
    return jnp.concatenate(
        [zpad, head, flat[n:n + R], tail, zpad], axis=0)


def _valid_bounds(g, H_true, n_shards):
    """Local [lo, hi) row-validity window of this shard: the global window
    [n, n + H_true*wpad) shifted into local flat coordinates (local body
    row 0 sits at global flat position n + k*R)."""
    k = lax.axis_index(AXIS)
    base = k * (g.T * g.n)
    return jnp.stack([g.n - base, g.n + H_true * g.wpad - base]).astype(
        jnp.int32)


def _local_geom(Hp, W2, tile_h, n_shards):
    assert Hp % (n_shards * tile_h) == 0, (
        f"padded H {Hp} must split into whole tiles: pad to a multiple of "
        f"n_shards*tile_h = {n_shards * tile_h} (see pad_h)")
    return Geom(Hp // n_shards, W2, tile_h)


# ---------------------------------------------------------------------------
# forward


def _fwd_local(ws, gammas, betas, a1_loc, *, g, H_true, n_shards,
               store_dtype, conv=None):
    L = ws.shape[0]
    odd = fwd_odd(conv)
    store_o = store_odd_act(conv)
    dot16 = dot_bf16(default=True)  # training default: see dot_bf16
    count = float(2 * H_true * g.W2)  # GLOBAL pixel count per channel
    vb = _valid_bounds(g, H_true, n_shards)

    cur = _exchange(to_flat(a1_loc.astype(store_dtype), g), g, n_shards)
    s_vec = jnp.ones((128,), jnp.float32)
    b_vec = jnp.zeros((128,), jnp.float32)
    a_flat = cur
    z_list, o_list, means, vars_, svecs, bvecs = [], [], [], [], [], []
    for i in range(L):
        w2 = pack_kernel_odd(ws[i]) if odd else pack_kernel_flat(ws[i])
        svecs.append(s_vec); bvecs.append(b_vec)
        outs = fwd_layer(cur, w2, s_vec, b_vec, g, odd=odd,
                         valid_bounds=vb, emit_act=store_o, dot16=dot16)
        if store_o:
            # the stored odd slab covers tile-owned BODY rows only, which is
            # exactly what bwd's dW reads — no halo exchange needed for it
            z, o, stats = outs
            o_list.append(o)
        else:
            z, stats = outs
        stats = lax.psum(stats, AXIS)  # sync-BN: exact global statistics
        m = fold_vec(stats[0]) / count
        v = fold_vec(stats[1]) / count - jnp.square(m)
        s64, b64, _ = _affine_from_stats(m, v, gammas[i], betas[i])
        s_vec, b_vec = tile_vec(s64), tile_vec(b64)
        z = _exchange(z, g, n_shards)  # halos for layer i+1 and for bwd
        z_list.append(z)
        means.append(m); vars_.append(v)
        cur = z

    zf = z_list[-1].astype(jnp.float32)
    a_out = from_flat(jnp.maximum(zf * s_vec + b_vec, 0.0), g)
    out = (a_out, jnp.stack(means), jnp.stack(vars_), a_flat,
           jnp.stack(z_list), jnp.stack(svecs), jnp.stack(bvecs))
    if store_o:
        out += (jnp.stack(o_list),)
    return out


# ---------------------------------------------------------------------------
# backward


def _bwd_local(ws, gammas, betas, a_flat, z_stack, svecs, bvecs, means,
               vars_, da_out_loc, *o_stack_opt, g, H_true, n_shards,
               store_dtype, conv=None):
    L = ws.shape[0]
    odd = bwd_odd(conv)
    store_o = store_odd_act(conv)
    dot16 = dot_bf16(default=True)  # training default: see dot_bf16
    o_stack = o_stack_opt[0] if store_o else None
    count = float(2 * H_true * g.W2)
    vb = _valid_bounds(g, H_true, n_shards)

    sL, bL, rstdL = _affine_from_stats(means[-1], vars_[-1],
                                       gammas[-1], betas[-1])
    sL2, bL2 = tile_vec(sL), tile_vec(bL)
    # reductions run on the PRE-exchange cotangent: its head/tail tiles are
    # zero, so the local sums cover exactly this shard's body rows (the
    # z halos are nonzero, but multiply against zero g there)
    g_flat = to_flat(da_out_loc.astype(store_dtype), g)
    zLf = z_stack[-1].astype(jnp.float32)
    mask = ((zLf * sL2 + bL2) > 0.0).astype(jnp.float32)
    gt = g_flat.astype(jnp.float32) * mask
    zhat = (zLf - tile_vec(means[-1])) * tile_vec(rstdL)
    dbeta = lax.psum(fold_vec(jnp.sum(gt, axis=0)), AXIS)
    dgamma = lax.psum(fold_vec(jnp.sum(gt * zhat, axis=0)), AXIS)

    gx = _exchange(g_flat, g, n_shards)
    dws, dgammas, dbetas = [None] * L, [None] * L, [None] * L
    for i in range(L - 1, -1, -1):
        if i + 1 < L:
            s_i, b_i = svecs[i + 1], bvecs[i + 1]
        else:
            s_i, b_i = sL2, bL2
        rstd_i = lax.rsqrt(vars_[i] + EPS)
        A = gammas[i] * rstd_i
        B = -A * rstd_i * (dgamma / count)
        C = A * (means[i] * rstd_i * (dgamma / count) - dbeta / count)
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
        zprev = z_stack[i - 1] if i > 0 else a_flat
        da, dw2, stats = bwd_layer(gx, z_stack[i], zprev, w2t, vecs, g,
                                   first_layer=(i == 0), odd=odd,
                                   valid_bounds=vb,
                                   o_flat=o_stack[i] if store_o else None,
                                   dot16=dot16)
        dw2 = lax.psum(dw2, AXIS)
        dws[i] = fold_dw6(dw2) if odd else fold_dw2(dw2)
        dgammas[i] = dgamma
        dbetas[i] = dbeta
        if i > 0:
            stats = lax.psum(stats, AXIS)
            dbeta = fold_vec(stats[0])
            dgamma = fold_vec(stats[1])
            gx = _exchange(da, g, n_shards)
        else:
            gx = da  # from_flat reads body rows only; no halo needed

    da1 = from_flat(gx, g).astype(jnp.float32)
    return jnp.stack(dws), jnp.stack(dgammas), jnp.stack(dbetas), da1


# ---------------------------------------------------------------------------
# the differentiable sharded mid-stack


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_mid_stack_spatial(ws, gammas, betas, a1, H_true, tile_h,
                            store_dtype, mesh, conv=None):
    """H-sharded (conv3x3 + BatchNorm(train) + ReLU)^L on the fused engine.

    ws: (L, 3, 3, 64, 64) f32; gammas/betas: (L, 64) f32;
    a1: (1, Hp, W2, 128) packed stack input, Hp = pad_h(H, D, tile_h) rows
    (rows >= H_true are ignored: masked from statistics, garbage past them
    is the caller's to crop);
    mesh: a Mesh with a ``space`` axis (other axes must be trivial here);
    conv: formulation override (fused_stack.conv_mode).

    Returns (a_out (1, Hp, W2, 128) f32, means (L, 64), vars (L, 64)) with
    single-chip fused_mid_stack semantics (exact global BN statistics).
    """
    out, _ = _fused_fwd_spatial(ws, gammas, betas, a1, H_true, tile_h,
                                store_dtype, mesh, conv)
    return out


def _fused_fwd_spatial(ws, gammas, betas, a1, H_true, tile_h, store_dtype,
                       mesh, conv=None):
    from jax.sharding import PartitionSpec as P

    D = mesh.shape[AXIS]
    _, Hp, W2, _ = a1.shape
    g = _local_geom(Hp, W2, tile_h, D)
    store_o = store_odd_act(conv)

    out_specs = (P(None, AXIS, None, None), P(), P(),
                 P(AXIS, None), P(None, AXIS, None), P(), P())
    if store_o:
        out_specs += (P(None, AXIS, None),)
    fn = jax.shard_map(
        partial(_fwd_local, g=g, H_true=H_true, n_shards=D,
                store_dtype=store_dtype, conv=conv),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, AXIS, None, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    outs = fn(ws, gammas, betas, a1)
    a_out, means, vars_, a_flat, z_stack, svecs, bvecs = outs[:7]
    o_stack = outs[7] if store_o else None
    res = (ws, gammas, betas, a_flat, z_stack, o_stack, svecs, bvecs,
           means, vars_)
    return (a_out, means, vars_), res


def _fused_bwd_spatial(H_true, tile_h, store_dtype, mesh, conv, res, cts):
    from jax.sharding import PartitionSpec as P

    da_out, _dm, _dv = cts  # stat cotangents are zero (stop_gradient updates)
    (ws, gammas, betas, a_flat, z_stack, o_stack, svecs, bvecs, means,
     vars_) = res
    D = mesh.shape[AXIS]
    _, Hp, W2, _ = da_out.shape
    g = _local_geom(Hp, W2, tile_h, D)
    store_o = store_odd_act(conv)

    in_specs = (P(), P(), P(), P(AXIS, None), P(None, AXIS, None),
                P(), P(), P(), P(), P(None, AXIS, None, None))
    ins = [ws, gammas, betas, a_flat, z_stack, svecs, bvecs, means,
           vars_, da_out]
    if store_o:
        in_specs += (P(None, AXIS, None),)
        ins.append(o_stack)
    fn = jax.shard_map(
        partial(_bwd_local, g=g, H_true=H_true, n_shards=D,
                store_dtype=store_dtype, conv=conv),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P(), P(None, AXIS, None, None)),
        check_vma=False,
    )
    return fn(*ins)


fused_mid_stack_spatial.defvjp(_fused_fwd_spatial, _fused_bwd_spatial)


# ---------------------------------------------------------------------------
# eval-mode sharded stack (running statistics, no updates, not differentiated)


def _eval_local(ws, svecs, bvecs, a1_loc, *, g, H_true, n_shards,
                store_dtype, conv=None):
    L = ws.shape[0]
    odd = fwd_odd(conv)
    vb = _valid_bounds(g, H_true, n_shards)
    cur = _exchange(to_flat(a1_loc.astype(store_dtype), g), g, n_shards)
    for i in range(L):
        w2 = pack_kernel_odd(ws[i]) if odd else pack_kernel_flat(ws[i])
        cur, = fwd_layer(cur, w2, svecs[i], bvecs[i], g, odd=odd,
                         valid_bounds=vb, emit_stats=False)
        if i + 1 < L:
            cur = _exchange(cur, g, n_shards)
    a_out = from_flat(
        jnp.maximum(cur.astype(jnp.float32) * svecs[L] + bvecs[L], 0.0), g)
    return a_out


def _act_eval_local(ws, svecs, bvecs, a1_loc, *, g, H_true, n_shards,
                    chain_dtype, conv=None):
    """Act-space eval chain, shard-local: the layer's eval BN scale is
    folded into its conv weights and the bias+ReLU+mask ride the kernel
    epilogue (fused_stack.fwd_layer_eval) — activations chain POST-activation
    between layers, so the ppermute halos carry already-masked rows and the
    consumer does no operand masking (see models/fused_apply._eval_impl)."""
    L = ws.shape[0]
    odd = fwd_odd(conv)
    vb = _valid_bounds(g, H_true, n_shards)
    cur = _exchange(to_flat(a1_loc.astype(chain_dtype), g), g, n_shards)
    for i in range(L):
        # svecs/bvecs entry i+1 is the affine applied AFTER conv_i (the
        # caller's convention indexes affines by the layer input they feed)
        s64 = svecs[i + 1][:64]
        w2 = (pack_kernel_odd(ws[i] * s64[None, None, None, :]) if odd
              else pack_kernel_flat(ws[i] * s64[None, None, None, :]))
        cur, = fwd_layer_eval(cur, w2, bvecs[i + 1], g, odd=odd,
                              valid_bounds=vb)
        if i + 1 < L:
            cur = _exchange(cur, g, n_shards)
    return from_flat(cur.astype(jnp.float32), g)


def eval_mid_stack_spatial(ws, svecs, bvecs, a1, H_true, tile_h,
                           store_dtype, mesh, conv=None, eval_impl=None):
    """H-sharded eval-mode mid-stack: per-layer affines precomputed from
    RUNNING statistics (svecs/bvecs (L+1, 128): entry i is applied to layer
    i's *input*, entry 0 = identity, entry L = the final affine).
    ``eval_impl`` selects the affine-chained vs act-chained kernels
    (models/fused_apply._eval_impl; F2F_EVAL env overrides)."""
    from jax.sharding import PartitionSpec as P

    from ..models.fused_apply import _eval_chain_dtype, _eval_impl

    D = mesh.shape[AXIS]
    _, Hp, W2, _ = a1.shape
    g = _local_geom(Hp, W2, tile_h, D)
    if _eval_impl(eval_impl) == "act":
        local = partial(_act_eval_local, g=g, H_true=H_true, n_shards=D,
                        chain_dtype=_eval_chain_dtype(eval_impl), conv=conv)
    else:
        local = partial(_eval_local, g=g, H_true=H_true, n_shards=D,
                        store_dtype=store_dtype, conv=conv)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, AXIS, None, None)),
        out_specs=P(None, AXIS, None, None),
        check_vma=False,
    )
    return fn(ws, svecs, bvecs, a1)
