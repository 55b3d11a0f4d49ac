"""Sharded (multi-chip) training steps via shard_map over a (data, time) mesh.

TPU-native scaling design (SURVEY.md §2.4 "TPU-native plan"):
- **data parallelism**: video batch sharded over the ``data`` axis, per-replica
  grads all-reduced with ``psum`` over ICI — replaces the reference's
  single-GPU ``nn.DataParallel`` wrapper (blind_denoising.py:145-146) and the
  external DDP launch;
- **temporal context parallelism**: long sequences sharded over the ``time``
  axis; the frame-to-frame loss couples frame t with t-1, so each time shard
  receives a one-frame halo from its left neighbor via ``ppermute`` — the CP
  analogue of the reference's host-side temporal chunking (test.py:172-175);
- params/optimizer replicated; BatchNorm batch stats ``pmean``-ed across the
  mesh each step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.warp import warped_dist_loss


def make_sharded_f2f_step(model, mesh, tx, dist_crit="l2", residual=True,
                          train_bn=True):
    """Build a jitted sharded train step for the frame2frame (warped) loss.

    step(params, batch_stats, opt_state, noisy, bflow) ->
        (params, batch_stats, opt_state, loss)

    noisy: (B, T, H, W, C) sharded (data, time); bflow: (B, T, H, W, 2) sharded
    likewise, where bflow[:, t] maps frame t to frame t-1 (bflow[:, 0] unused).

    ``train_bn=True`` computes BatchNorm statistics per shard (standard
    data-parallel local-BN semantics; stats are pmean-ed into the running
    averages). ``train_bn=False`` normalizes with running averages, making the
    step numerically identical to the unsharded computation (and matching the
    reference's BN-frozen adaptation mode, instances_adapt.py:200-206).
    """
    n_time = mesh.shape["time"]
    axes = ("data", "time")

    def shard_fn(params, batch_stats, opt_state, noisy, bflow):
        tix = lax.axis_index("time")

        # one-frame halo: each shard sends its last frame to the right neighbor
        perm = [(i, i + 1) for i in range(n_time - 1)]
        halo = lax.ppermute(noisy[:, -1], "time", perm)  # zeros on shard 0
        prev = jnp.concatenate([halo[:, None], noisy[:, :-1]], axis=1)

        # frame-pair validity: every local frame except the global first
        t_loc = noisy.shape[1]
        b_loc = noisy.shape[0]
        local_idx = jnp.arange(t_loc)
        valid = (tix * t_loc + local_idx) > 0  # (t_loc,)
        # global pair count: every (batch row, valid frame) pair
        n_pairs = lax.psum(b_loc * jnp.sum(valid.astype(noisy.dtype)), axes)

        pair_loss = jax.vmap(jax.vmap(
            partial(warped_dist_loss, dist_crit=dist_crit)))

        def loss_fn(p, bs):
            if train_bn:
                deno, upd = model.apply({"params": p, "batch_stats": bs},
                                        noisy, train=True,
                                        mutable=["batch_stats"])
                new_bs = upd["batch_stats"]
            else:
                deno = model.apply({"params": p, "batch_stats": bs}, noisy,
                                   train=False)
                new_bs = bs
            if not residual:
                deno = noisy - deno
            losses = pair_loss(deno, prev, bflow)  # (b_loc, t_loc)
            local = jnp.sum(losses * valid[None, :])
            return local / n_pairs, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats)
        grads = lax.psum(grads, axes)
        loss = lax.psum(loss, axes)
        new_bs = jax.tree.map(lambda x: lax.pmean(x, axes), new_bs)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    vid_spec = P("data", "time")
    rep = P()
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, vid_spec, vid_spec),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def halo_exchange_time(x, halo, n_time):
    """(B, t_loc, ...) -> (B, t_loc + 2*halo, ...): ``halo`` frames from each
    time-axis neighbor via ppermute (zeros beyond the global sequence ends).
    Differentiable — gradients for halo frames flow back to their owners."""
    if halo == 0 or n_time == 1:
        pad = jnp.zeros_like(x[:, :halo])
        return jnp.concatenate([pad, x, pad], axis=1) if halo else x
    to_right = [(i, i + 1) for i in range(n_time - 1)]
    to_left = [(i + 1, i) for i in range(n_time - 1)]
    left_halo = lax.ppermute(x[:, -halo:], "time", to_right)
    right_halo = lax.ppermute(x[:, :halo], "time", to_left)
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def _halo_window_tables(tix, t_loc, n_time, wt):
    """Window tables for an extended halo block, in extended-local coords.

    Each shard's block is [start, start + t_loc + 4*wt) with
    start = tix*t_loc - 2*wt; windows follow the GLOBAL clamped layout
    (ops/nls.time_window_frames), so center frames reproduce the unsharded
    search exactly. Returns (tj_local, valid, frame_weight)."""
    halo = 2 * wt
    T_g = t_loc * n_time
    T_ext = t_loc + 2 * halo
    start = tix * t_loc - halo
    li = jnp.arange(T_ext)
    g = start + li  # global frame index of each block row (may be outside)
    lo = jnp.clip(jnp.minimum(g - wt, T_g - (2 * wt + 1)), 0)
    win = lo[:, None] + jnp.arange(2 * wt + 1)[None, :]  # (T_ext, 2wt+1)
    # drop the reference frame from each row, preserving order
    not_ref = win != g[:, None]
    order = jnp.argsort(~not_ref, axis=1, stable=True)
    tj_g = jnp.take_along_axis(win, order[:, : 2 * wt], axis=1)
    valid = (tj_g >= 0) & (tj_g < T_g) & (g >= 0)[:, None] & (g < T_g)[:, None]
    tj_local = jnp.clip(tj_g - start, 0, T_ext - 1)
    frame_weight = ((li >= halo) & (li < halo + t_loc)).astype(jnp.float32)
    return tj_local.astype(jnp.int32), valid, frame_weight


def make_sharded_window_step(model, mesh, tx, loss, kind="warped", wt=1,
                             residual=True, train_bn=False, step_i=0):
    """Sharded train step for the temporal-window losses: ``WarpedLoss``
    (kind="warped", losses/warped.py run_pairs — reference
    warped_loss.py:271-317) and ``DnlsLoss`` (kind="stnls",
    losses/stnls.py — reference stnls_loss.py:319-424), time-sharded with a
    +/-2*wt-frame ppermute halo (SURVEY §2.4's "halo-exchange +/-wt frames
    for non-local search" plan; 2*wt covers clamped windows at the sequence
    ends).

    step(params, batch_stats, opt_state, noisy, clean, fflow, bflow)
        -> (params, batch_stats, opt_state, loss)

    ``step_i`` (the schedule epoch/step) is a BUILD parameter: the losses'
    ps/ws/k schedules change array shapes, so each schedule stage is its own
    compiled program (rebuild the step when the schedule advances).

    Exactness: with ``train_bn=False`` (BN running averages, the reference's
    BN-frozen adaptation mode, instances_adapt.py:200-206) the step is
    numerically identical to the unsharded loss: the (per-frame) model re-runs
    on the exchanged halo frames locally, so every pair term AND its parameter
    gradient match the global computation; windows use global clamping, and
    per-frame weighted sums psum to the global mean. ``train_bn=True`` uses
    per-shard batch stats over the extended block (local-BN DP semantics).
    ``search_input="noisy-g-*"`` draws per-shard noise and is not exact.
    """
    n_time = mesh.shape["time"]
    axes = ("data", "time")
    halo = 2 * wt

    def check_shapes(noisy):
        t_loc = noisy.shape[1] // n_time
        if noisy.shape[1] % n_time or t_loc < halo:
            raise ValueError(
                f"time-sharded window losses need each of the {n_time} time "
                f"shards to hold at least 2*wt={halo} frames (the single-hop "
                f"ppermute halo reaches only the adjacent shard); got "
                f"T={noisy.shape[1]} -> {t_loc} frames/shard. Use fewer time "
                f"shards or more frames.")

    def shard_fn(params, batch_stats, opt_state, noisy, clean, fflow, bflow):
        tix = lax.axis_index("time")
        t_loc = noisy.shape[1]
        tables2 = _halo_window_tables(tix, t_loc, n_time, wt)
        tj_tab, valid_tab, frame_w = tables2
        noisy_ext = halo_exchange_time(noisy, halo, n_time)
        clean_ext = halo_exchange_time(clean, halo, n_time)
        fflow_ext = halo_exchange_time(fflow, halo, n_time)
        bflow_ext = halo_exchange_time(bflow, halo, n_time)

        def loss_fn(p, bs):
            if train_bn:
                deno, upd = model.apply({"params": p, "batch_stats": bs},
                                        noisy_ext, train=True,
                                        mutable=["batch_stats"])
                new_bs = upd["batch_stats"]
            else:
                deno = model.apply({"params": p, "batch_stats": bs},
                                   noisy_ext, train=False)
                new_bs = bs
            if not residual:
                deno = noisy_ext - deno
            from ..config import Config

            if kind == "warped":
                wsum, wcount = loss.run_pairs(
                    deno, noisy_ext, Config(fflow=fflow_ext, bflow=bflow_ext),
                    step=step_i, tables=(tj_tab, valid_tab),
                    frame_weight=frame_w)
            elif kind == "stnls":
                wsum, wcount = loss(
                    noisy_ext, clean_ext, deno,
                    {"fflow": fflow_ext, "bflow": bflow_ext}, step_i,
                    tables=(tj_tab, valid_tab), frame_weight=frame_w)
            else:
                raise ValueError(kind)
            denom = lax.psum(lax.stop_gradient(wcount), axes)
            return wsum / denom, new_bs

        (loss_v, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats)
        grads = lax.psum(grads, axes)
        loss_v = lax.psum(loss_v, axes)
        if train_bn:
            new_bs = jax.tree.map(lambda x: lax.pmean(x, axes), new_bs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss_v

    vid_spec = P("data", "time")
    rep = P()
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, vid_spec, vid_spec, vid_spec, vid_spec),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(params, batch_stats, opt_state, noisy, clean, fflow, bflow):
        check_shapes(noisy)
        return jitted(params, batch_stats, opt_state, noisy, clean, fflow,
                      bflow)

    return step


def make_sharded_sup_step(model, mesh, tx, residual=True):
    """Sharded supervised (MSE vs clean) train step — same mesh layout, no halo.
    Covers the harness's "sup" criterion (lightning.py:347-350)."""
    axes = ("data", "time")

    def shard_fn(params, batch_stats, opt_state, noisy, clean):
        def loss_fn(p, bs):
            deno, upd = model.apply({"params": p, "batch_stats": bs}, noisy,
                                    train=True, mutable=["batch_stats"])
            if not residual:
                deno = noisy - deno
            local = jnp.sum((deno - clean) ** 2)
            n = lax.psum(jnp.asarray(clean.size, noisy.dtype), axes)
            return lax.psum(local, axes) / n, upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats)
        grads = lax.psum(grads, axes)
        new_bs = jax.tree.map(lambda x: lax.pmean(x, axes), new_bs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    vid_spec = P("data", "time")
    rep = P()
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, vid_spec, vid_spec),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)
