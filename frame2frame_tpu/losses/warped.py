"""Harness warped (frame2frame) loss over temporal windows.

Re-implements the reference ``WarpedLoss`` + ``run_pairs``
(lib/frame2frame/warped_loss.py:117-317): for each frame t and each neighbor
frame in the +/-wt temporal window, warp the noisy neighbor onto the denoised
frame via (optionally refined) flow, mask occlusions, and accumulate a
charbonnier-L1 or L2 distance, averaged over all pairs.

Differences from the reference (by design, TPU-first):
- all frame pairs evaluate in one vmapped computation, not a Python loop over
  (ti, tj) with per-pair CUDA kernels;
- the optional non-local flow refinement (warped_loss.py:250-269) uses the
  dense cost-volume search in ops/nls.py instead of the stnls CUDA kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.warp import warped_dist_loss
from ..ops.nls import paired_refine, search_flow_compose


class WarpedLoss:
    """Config mirror of warped_loss.py:117-131."""

    def __init__(self, dist_crit="l2", use_stnls=False, loss_type="warp",
                 ws=9, ps=7, dist_mask=2e-1, ps_scale=1.0, ps_final=1,
                 wt=1, stride0=1):
        self.dist_crit = dist_crit
        self.use_stnls = use_stnls
        self.loss_type = loss_type
        self.ws = ws
        self.ps = ps
        self.ps_scale = ps_scale
        self.ps_final = ps_final
        self.dist_mask = dist_mask
        self.wt = wt
        self.stride0 = stride0

    def get_ps(self, step):
        """Geometric patch-size decay ps -> ps_final (warped_loss.py:133-143)."""
        alpha = self.ps_scale**step
        ps = alpha * self.ps + (1 - alpha) * self.ps_final
        ps = int(round(ps))
        if ps % 2 == 0:
            ps += 1
        return max(ps, self.ps_final)

    def pair_loss(self, deno_t, noisy_j, flow, step, in_mask=None):
        """Single (deno frame, noisy neighbor, flow t->j) loss
        (warped_loss.py:213-237)."""
        if self.loss_type == "warp":
            return warped_dist_loss(deno_t, noisy_j, flow,
                                    dist_crit=self.dist_crit, in_mask=in_mask)
        # "stnls" path: patch-refine distance at the given flow offsets
        ps = self.get_ps(step)
        dists = paired_refine(deno_t, noisy_j, flow, ps=ps)
        if in_mask is None:
            return jnp.mean(dists)
        return jnp.mean(in_mask * dists)

    def refine_flow(self, src, tgt, flow):
        """Optional non-local refinement of the flow between two frames
        (warped_loss.py:250-269). Returns (dists, refined_flow)."""
        if not self.use_stnls:
            return jnp.zeros_like(flow[..., :1]), flow
        from ..ops.nls import refine_flow_search

        F = src.shape[-1]
        dists, inds = refine_flow_search(
            jax.lax.stop_gradient(src), jax.lax.stop_gradient(tgt), flow,
            ws=self.ws, ps=self.ps, stride0=self.stride0,
        )
        dists = dists / (self.ps**2 * F)
        return dists, inds

    def run_pairs(self, deno, noisy, flows, step=0, tables=None,
                  frame_weight=None):
        """Accumulate the loss over all frame pairs in the +/-wt window
        (warped_loss.py:271-317).

        deno/noisy: (B, T, H, W, C); flows: Config(fflow, bflow) of
        (B, T, H, W, 2). Returns scalar loss (mean over pairs).

        ``tables``: optional (tj, valid) (T, 2*wt) window override (entries
        may be traced) for time-sharded halo blocks; ``frame_weight`` (T,):
        return (weighted sum of pair means, weighted pair count) instead, so
        shards contribute only their own frames (parallel/shard.py).
        """
        B, T, H, W, C = deno.shape
        wt = self.wt
        S = 2 * wt
        comp = search_flow_compose(flows.fflow, flows.bflow, wt, tables=tables)
        # comp: (B, T, 2*wt, H, W, 2); slot m: flow from t to the m-th frame of
        # the (ref-removed) temporal window of t
        if tables is None:
            from ..ops.nls import _window_tables

            # single source of truth for the clamped-window layout (the comp
            # slots above are built from the same table)
            tj_tab = _window_tables(T, wt)[0]
        else:
            tj_tab = tables[0]

        # one lax.scan over the T*S (frame, window-slot) pairs: trace size and
        # compile time are O(1) in sequence length (like ops/nls.py), where the
        # former Python double-loop traced O(T*2wt) copies of the pair body
        tj_flat = jnp.asarray(tj_tab).reshape(T * S)
        ti_flat = jnp.repeat(jnp.arange(T), S)
        comp_flat = comp.transpose(1, 2, 0, 3, 4, 5).reshape(
            (T * S, B, H, W, 2))
        if frame_weight is None:
            w_flat = jnp.ones((T * S,), jnp.float32)
        else:
            w_flat = jnp.repeat(
                jnp.asarray(frame_weight, jnp.float32), S)

        def body(acc, xs):
            ti, tj, flow, w = xs
            deno_t = jnp.take(deno, ti, axis=1)
            deno_j = jnp.take(deno, tj, axis=1)
            noisy_j = jnp.take(noisy, tj, axis=1)
            dists, flow = jax.vmap(
                lambda d, n, f: self.refine_flow(d, n, f)
            )(deno_t, deno_j, flow)
            mask = (dists < self.dist_mask).astype(deno.dtype)
            if not self.use_stnls:
                mask = None
            pair = jnp.mean(
                jax.vmap(partial(self.pair_loss, step=step))(
                    deno_t, noisy_j, flow,
                    in_mask=mask if mask is not None else None,
                )
            )
            return acc + w * pair, None

        loss, _ = jax.lax.scan(body, jnp.float32(0.0),
                               (ti_flat, tj_flat, comp_flat, w_flat))
        if frame_weight is None:
            return loss / (T * S)
        return loss, jnp.sum(frame_weight) * S


def time_window_inds(ti, wt, T):
    """Temporal window frame indices for reference frame ti: [ti, then the
    2*wt nearest other frames clamped into [0, T)], matching stnls
    ``get_time_window_inds`` semantics (warped_loss.py:289-293): a window of
    2*wt+1 frames shifted to fit inside the sequence, reference frame first."""
    lo = max(0, min(ti - wt, T - (2 * wt + 1)))
    hi = min(T, lo + 2 * wt + 1)
    frames = [t for t in range(lo, hi) if t != ti]
    return [ti] + frames
