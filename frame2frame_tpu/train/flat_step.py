"""Whole-iteration flat-layout online fine-tune step (round 5).

The round-4/5 step decomposition (BASELINE.md "XLA-remainder decomposition")
measured ~3.3 ms/iter of XLA work AROUND the fused mid-stack: layout copies
(``to_flat``/``from_flat`` of the ~69 MB activation slab, four per
iteration), the final BN+ReLU and its dgamma/dbeta reductions as f32 HBM
passes over the (tot, 128) slab, the image-space boundary convs, and the L1
loss elementwise. This module removes that remainder structurally: one
``custom_vjp`` covers conv_in -> (conv+BN+ReLU)^L -> final BN+ReLU ->
conv_out -> masked summed L1, entirely in the flat pair-packed layout, using
the mid-stack kernels unchanged (ops/fused_stack.py) plus the boundary/loss
kernels of ops/fused_ends.py. Per-frame constants (the input's odd slab and
the loss aux arrays) are built ONCE outside the 20-iteration scan — they are
loop-invariant, which the per-iteration XLA graph could never exploit across
a custom-VJP boundary.

Semantics: identical math to the established path
(models/fused_apply.fused_train_apply + the image-space L1 of
train/online.make_online_step), itself parity-pinned against the reference
hot loop (blind_denoising.py:216-222, nn.L1Loss(size_average=False) at
blind_denoising.py:47). Differences are f32 summation order only; pinned by
tests/test_flat_step.py.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..models.fused_apply import BN_MOMENTUM, can_fuse
from ..ops.fused_ends import (
    embed_pair_lanes,
    embed_w_in,
    embed_w_out,
    first_conv,
    first_dw,
    last_loss_bwd,
    last_loss_fwd,
    odd_slab_host,
)
from ..ops.fused_stack import (
    Geom,
    _affine_from_stats,
    bwd_layer,
    conv_mode,
    default_tile_h,
    dot_bf16,
    fold_dw6,
    fold_vec,
    fwd_layer,
    pack_kernel_odd,
    pack_kernel_odd_bwd,
    store_odd_act,
    tile_vec,
    to_flat,
)
from ..ops.packed import pack_image


def eligible(model, x_shape, conv, residual_model, spatial_mesh=None):
    """The flat step covers the production online config: fused odd-form
    stored-O single-chip engine on a 1-channel frame whose geometry the
    fused pipeline accepts, with the standard residual convention (denoised
    = x - raw conv-stack output). ``F2F_FLATSTEP=0`` reverts to the
    per-iteration image-space ends (A/B switch)."""
    if os.environ.get("F2F_FLATSTEP") == "0":
        return False
    if spatial_mesh is not None:
        return False
    if getattr(model, "conv_impl", None) != "fused":
        return False
    force = os.environ.get("F2F_FUSED") == "force"
    if not force and (jax.default_backend() != "tpu"
                      or os.environ.get("F2F_FUSED") == "0"):
        return False
    H, W, C = x_shape
    if C != 1:
        return False
    if residual_model != bool(getattr(model, "residual", False)):
        return False
    if conv_mode(conv) != "odd" or not store_odd_act(conv):
        return False
    return can_fuse(model, (1, H, W, C), conv=conv)


# ---------------------------------------------------------------------------
# the fused net+loss custom VJP


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def flat_net_loss(diff, data, H, W2, tile_h, conv):
    """loss, means, vars of the full DnCNN + masked summed-L1 in flat space.

    diff: {"w_in" (3,3,1,64), "ws" (L,3,3,64,64), "gammas"/"betas" (L,64),
    "w_out" (3,3,64,1)} — the differentiated parameters;
    data: {"ox", "aux_c", "aux_m"} per-frame flat constants (ox = odd slab of
    the lane-embedded input, bf16; aux_c = flat(mask*x - target) f32;
    aux_m = flat(mask) f32). Loss = sum |mask*(x - net(x)) - target|."""
    out, _ = _flat_fwd(diff, data, H, W2, tile_h, conv)
    return out


def _flat_fwd(diff, data, H, W2, tile_h, conv):
    ws, gammas, betas = diff["ws"], diff["gammas"], diff["betas"]
    L = ws.shape[0]
    g = Geom(H, W2, tile_h)
    dot16 = dot_bf16(default=True)

    z1 = first_conv(data["ox"], pack_kernel_odd(embed_w_in(diff["w_in"])), g)

    cur = z1
    s_vec = jnp.ones((128,), jnp.float32)
    b_vec = jnp.zeros((128,), jnp.float32)
    z_list, o_list, means, vars_, svecs, bvecs = [], [], [], [], [], []
    for i in range(L):
        w2 = pack_kernel_odd(ws[i])
        svecs.append(s_vec)
        bvecs.append(b_vec)
        z, o, stats = fwd_layer(cur, w2, s_vec, b_vec, g, odd=True,
                                emit_act=True, dot16=dot16)
        o_list.append(o)
        m = fold_vec(stats[0]) / g.count
        v = fold_vec(stats[1]) / g.count - jnp.square(m)
        s64, b64, _ = _affine_from_stats(m, v, gammas[i], betas[i])
        s_vec, b_vec = tile_vec(s64), tile_vec(b64)
        z_list.append(z)
        means.append(m)
        vars_.append(v)
        cur = z

    w6_out = pack_kernel_odd(embed_w_out(diff["w_out"]))
    noise, oL, lossp = last_loss_fwd(z_list[-1], data["aux_c"],
                                     data["aux_m"], w6_out, s_vec, b_vec, g,
                                     dot16=dot16)
    loss = jnp.sum(lossp)
    means = jnp.stack(means)
    vars_ = jnp.stack(vars_)
    res = (diff, data, z1, tuple(z_list), tuple(o_list), oL, noise,
           jnp.stack(svecs), jnp.stack(bvecs), means, vars_)
    return (loss, means, vars_), res


def _flat_bwd(H, W2, tile_h, conv, res, cts):
    dloss, _dm, _dv = cts  # stat cotangents are zero (stop_gradient updates)
    (diff, data, z1, z_list, o_list, oL, noise,
     svecs, bvecs, means, vars_) = res
    ws, gammas, betas = diff["ws"], diff["gammas"], diff["betas"]
    L = ws.shape[0]
    g = Geom(H, W2, tile_h)
    dot16 = dot_bf16(default=True)

    # head: loss -> conv_out -> final BN+ReLU, with the last mid BN's
    # dbeta/dgamma reductions riding the kernel epilogue
    sL, bL, rstdL = _affine_from_stats(means[-1], vars_[-1],
                                       gammas[-1], betas[-1])
    vecsL = jnp.stack([
        tile_vec(sL), tile_vec(bL),
        tile_vec(rstdL), tile_vec(-means[-1] * rstdL),
    ]).astype(jnp.float32)
    v6_out = pack_kernel_odd_bwd(-embed_w_out(diff["w_out"]))
    g_flat, dw6_out, statsL = last_loss_bwd(
        noise, data["aux_c"], data["aux_m"], z_list[-1], oL, v6_out, vecsL,
        g, dot16=dot16)
    dw_out = -fold_dw6(dw6_out)[:, :, :, :1]
    dbeta = fold_vec(statsL[0])
    dgamma = fold_vec(statsL[1])

    # mid stack, mirroring fused_stack._fused_bwd (stored-O odd form)
    dws, dgammas, dbetas = [None] * L, [None] * L, [None] * L
    da0 = None
    for i in range(L - 1, -1, -1):
        if i + 1 < L:
            s_i, b_i = svecs[i + 1], bvecs[i + 1]
        else:
            s_i, b_i = tile_vec(sL), tile_vec(bL)
        rstd_i = lax.rsqrt(vars_[i] + 1e-5)
        A = gammas[i] * rstd_i
        B = -A * rstd_i * (dgamma / g.count)
        C = A * (means[i] * rstd_i * (dgamma / g.count) - dbeta / g.count)
        if i > 0:
            rstd_p = lax.rsqrt(vars_[i - 1] + 1e-5)
            D, E = tile_vec(rstd_p), tile_vec(-means[i - 1] * rstd_p)
        else:
            D, E = jnp.ones((128,)), jnp.zeros((128,))
        vecs = jnp.stack([
            s_i, b_i, tile_vec(B), tile_vec(C),
            svecs[i], bvecs[i], D, E,
        ]).astype(jnp.float32)
        w2t = pack_kernel_odd_bwd(ws[i])
        zprev = z_list[i - 1] if i > 0 else z1
        da, dw2, stats = bwd_layer(g_flat, z_list[i], zprev, w2t, vecs, g,
                                   first_layer=(i == 0), odd=True,
                                   o_flat=o_list[i], dot16=dot16)
        dws[i] = fold_dw6(dw2)
        dgammas[i] = dgamma
        dbetas[i] = dbeta
        if i > 0:
            dbeta = fold_vec(stats[0])
            dgamma = fold_vec(stats[1])
        g_flat = da
        if i == 0:
            da0 = da

    # tail: conv_in weight gradient against the prebuilt input odd slab
    dw_in = fold_dw6(first_dw(da0, z1, data["ox"], g, dot16=dot16))[:, :, :1]

    d_diff = {
        "w_in": dw_in * dloss,
        "ws": jnp.stack(dws) * dloss,
        "gammas": jnp.stack(dgammas) * dloss,
        "betas": jnp.stack(dbetas) * dloss,
        "w_out": dw_out * dloss,
    }
    # data cotangents are symbolically zero (per-frame constants) — XLA
    # dead-code-eliminates these
    return d_diff, jax.tree.map(jnp.zeros_like, data)


flat_net_loss.defvjp(
    lambda diff, data, H, W2, th, cv: _flat_fwd(diff, data, H, W2, th, cv),
    _flat_bwd)


# ---------------------------------------------------------------------------
# per-frame constants + the scan body


def prep_frame(cur, mask, target, g, store_dtype=jnp.bfloat16):
    """Per-frame flat constants (built once, OUTSIDE the fine-tune scan):
    the input's odd slab (the chain store dtype) and the loss aux arrays
    (f32). ``store_dtype`` sets the activation-chain dtype for the whole
    flat step (the kernels follow their input dtypes); f32 is the strict
    oracle-test mode."""
    def flat(img, dtype):
        return to_flat(embed_pair_lanes(pack_image(img), dtype)[None], g)

    xf = flat(cur, store_dtype)
    return {
        "ox": odd_slab_host(xf),
        "aux_c": flat(mask * cur - target, jnp.float32),
        "aux_m": flat(mask, jnp.float32),
    }


def run_flat_scan(model, tx, iters, conv, params, batch_stats, opt_state,
                  cur, mask, target, unroll=False):
    """The 20-iteration fine-tune scan with the flat-step loss. Returns
    (params, batch_stats, opt_state, losses) — drop-in for the scan inside
    train/online.make_online_step."""
    nmid = model.num_layers - 2
    H, W, _ = cur.shape
    W2 = W // 2
    tile_h = default_tile_h(W2)
    g = Geom(H, W2, tile_h)
    data = prep_frame(cur, mask, target, g)

    def diff_of(p):
        return {
            "w_in": p["conv_in"]["kernel"],
            "ws": jnp.stack([p[f"conv_{i}"]["kernel"] for i in range(nmid)]),
            "gammas": jnp.stack([p[f"bn_{i}"]["scale"] for i in range(nmid)]),
            "betas": jnp.stack([p[f"bn_{i}"]["bias"] for i in range(nmid)]),
            "w_out": p["conv_out"]["kernel"],
        }

    def body(carry, _):
        params, batch_stats, opt_state = carry

        def loss_fn(p):
            loss, means, vars_ = flat_net_loss(diff_of(p), data, H, W2,
                                               tile_h, conv)
            return loss, (means, vars_)

        (loss, (means, vars_)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_bs = {k: v for k, v in batch_stats.items()}
        for i in range(nmid):
            old = batch_stats[f"bn_{i}"]
            new_bs[f"bn_{i}"] = {
                "mean": (BN_MOMENTUM * old["mean"]
                         + (1 - BN_MOMENTUM) * means[i]),
                "var": (BN_MOMENTUM * old["var"]
                        + (1 - BN_MOMENTUM) * vars_[i]),
            }
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_bs, opt_state), loss

    (params, batch_stats, opt_state), losses = lax.scan(
        body, (params, batch_stats, opt_state), None, length=iters,
        unroll=iters if unroll else 1)
    return params, batch_stats, opt_state, losses
