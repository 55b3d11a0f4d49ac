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
