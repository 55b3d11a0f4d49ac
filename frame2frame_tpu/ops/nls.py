"""Space-time non-local patch search — TPU-native equivalents of the reference's
external ``stnls`` CUDA kernels (SURVEY.md §2.3; used by
lib/frame2frame/stnls_loss.py:274-298 and warped_loss.py:228-236).

Design (TPU-first, NOT a kernel translation): the stnls CUDA kernels are
gather-centric (each query walks its search window). On TPU the same math is
computed as a **dense cost volume**: for every integer offset o in the ws x ws
window, warp the target frame by (flow + o) once (bilinear), square the pixel
difference against the source frame, and box-filter with the ps x ps patch
window — three dense VPU-friendly passes per offset, no irregular gathers.
Top-k then runs over the offset axis. All queries (the stride0 grid) share the
work, which is exactly what the MXU/VPU want.

Semantics notes vs stnls (documented deviations, equivalent functionality):
- patch distances use the flow evaluated per-pixel inside the patch (a "warped
  SSD") rather than frozen at the query center; identical for locally constant
  flow, and the quantity actually minimized is the same frame-to-frame
  consistency;
- out-of-bounds patch/candidate pixels reflect at the border (stnls
  ``reflect_bounds=True``/``full_ws`` analogue);
- ``inds`` are float offset triples (dt, dx, dy) per query — add to the query
  coordinate to find the match (flow convention, like the .flo files).

API summary:
- ``search_flow_compose(fflow, bflow, wt)``: composed flows to every frame in
  the +/-wt window (stnls.nn.search_flow, warped_loss.py:290).
- ``non_local_search(vid, flows, ws, wt, ps, k, stride0)``: top-k dists+inds
  per query per window frame (stnls.search.NonLocalSearch with
  self_action="remove_ref_frame", topk_mode="each").
- ``refine_search(vid0, vid1, inds, wt, ps, stride0)``: re-evaluate distances
  at given inds between two other videos (stnls.search.RefineSearch, wr=1).
- ``paired_refine(src, tgt, flow, ps)``: single-pair patch distances at a flow
  (stnls.search.PairedRefine, wr=1).
- ``non_local_stack(vid, inds, wt)``: stack of aligned frames at the top-k
  offsets (stnls.agg.NonLocalStack).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

def _reflect_idx(i, n):
    """Reflect index into [0, n) (mirror without repeating the edge)."""
    i = jnp.abs(i)
    period = 2 * n - 2 if n > 1 else 1
    i = i % period
    return jnp.where(i >= n, period - i, i)


def bilinear_sample_reflect(img, sx, sy):
    """Bilinear sample of img (H, W, C) at float coords (sx, sy) with
    reflecting boundary; sx/sy shaped (H, W)."""
    H, W, C = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = img.reshape(H * W, C)

    def at(ix, iy):
        ix = _reflect_idx(ix, W)
        iy = _reflect_idx(iy, H)
        return jnp.take(flat, iy * W + ix, axis=0).reshape(H, W, C)

    v00 = at(x0, y0)
    v01 = at(x0 + 1, y0)
    v10 = at(x0, y0 + 1)
    v11 = at(x0 + 1, y0 + 1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def flow_warp_reflect(img, flow):
    """Warp img (H, W, C) by flow (H, W, 2): out[y, x] = img(x+u, y+v)."""
    H, W, _ = img.shape
    xx = jnp.arange(W, dtype=flow.dtype)[None, :]
    yy = jnp.arange(H, dtype=flow.dtype)[:, None]
    return bilinear_sample_reflect(img, xx + flow[..., 0], yy + flow[..., 1])


def box_filter_sum(x, ps):
    """Sum over centered ps x ps windows with reflect padding; x: (H, W)."""
    if ps <= 1:
        return x
    r = ps // 2
    xp = jnp.pad(x, ((r, ps - 1 - r), (r, ps - 1 - r)), mode="reflect")
    return lax.reduce_window(
        xp, 0.0, lax.add, window_dimensions=(ps, ps), window_strides=(1, 1),
        padding="VALID",
    )


def time_window_frames(ti, wt, T):
    """Non-ref frames of ti's clamped temporal window (size <= 2*wt), matching
    stnls get_time_window_inds minus the reference frame."""
    lo = max(0, min(ti - wt, T - (2 * wt + 1)))
    hi = min(T, lo + 2 * wt + 1)
    return [t for t in range(lo, hi) if t != ti]


def search_flow_compose(fflow, bflow, wt):
    """Composed flows from every frame to every frame of its +/-wt window.

    fflow/bflow: (B, T, H, W, 2); fflow[t] maps t -> t+1, bflow[t] maps
    t -> t-1. Returns (B, T, 2*wt, H, W, 2) where slot m is the flow from t to
    ``time_window_frames(t, wt, T)[m]``. Multi-step flows chain by warping the
    next hop's flow by the accumulated flow (stnls.nn.search_flow equivalent).
    """
    B, T, H, W, _ = fflow.shape
    warp_flow = jax.vmap(flow_warp_reflect)  # over batch

    def chain(t, tj):
        step = 1 if tj > t else -1
        flows = fflow if step == 1 else bflow
        acc = flows[:, t]
        cur = t + step
        while cur != tj:
            nxt = warp_flow(flows[:, cur], acc)
            acc = acc + nxt
            cur += step
        return acc

    out = []
    for t in range(T):
        slots = [chain(t, tj) for tj in time_window_frames(t, wt, T)]
        while len(slots) < 2 * wt:  # short sequences: pad with zeros
            slots.append(jnp.zeros_like(fflow[:, 0]))
        out.append(jnp.stack(slots, axis=1))
    return jnp.stack(out, axis=1)


def _pair_cost_volume(v0, v1, flow, ws, ps):
    """Cost volume for one (source frame, target frame, base flow):
    v0/v1 (H, W, C), flow (H, W, 2) -> dists (H, W, ws*ws), offsets (ws*ws, 2).

    dists[..., o] = sum over the ps x ps patch of (v0 - v1 warped by flow+o)^2.
    """
    r = ws // 2
    offs = []
    vols = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            o = jnp.asarray([dx, dy], flow.dtype)
            w = flow_warp_reflect(v1, flow + o)
            d2 = jnp.sum((v0 - w) ** 2, axis=-1)
            vols.append(box_filter_sum(d2, ps))
            offs.append(o)
    return jnp.stack(vols, axis=-1), jnp.stack(offs, axis=0)


def non_local_search(vid, flows, ws, wt, ps, k, stride0=1, srch_vid=None):
    """Top-k non-local search of ``vid`` against itself (or ``srch_vid``)
    guided by flows.

    vid: (B, T, H, W, C); flows: Config/dict with fflow/bflow or a
    precomposed (B, T, 2*wt, H, W, 2) array.
    Returns (dists, inds):
      dists: (B, T, nH, nW, 2*wt, k)
      inds:  (B, T, nH, nW, 2*wt, k, 3)  — float (dt, dx, dy) offsets
    Top-k is per window frame (stnls topk_mode="each"); the reference frame is
    excluded (self_action="remove_ref_frame").
    """
    if srch_vid is None:
        srch_vid = vid
    B, T, H, W, C = vid.shape
    if hasattr(flows, "fflow") or (isinstance(flows, dict) and "fflow" in flows):
        comp = search_flow_compose(flows["fflow"], flows["bflow"], wt)
    else:
        comp = flows

    def cost(v0, v1, fl):
        vols, offs = jax.vmap(partial(_pair_cost_volume, ws=ws, ps=ps))(v0, v1, fl)
        return vols, offs[0]  # offsets are batch-independent

    all_d, all_i = [], []
    for t in range(T):
        frames = time_window_frames(t, wt, T)
        d_slots, i_slots = [], []
        for m in range(2 * wt):
            tj = frames[m] if m < len(frames) else t  # padded slot: self, inf dist
            vols, offs = cost(vid[:, t], srch_vid[:, tj], comp[:, t, m])
            vols = vols[:, ::stride0, ::stride0, :]  # (B, nH, nW, ws*ws)
            if m >= len(frames):
                vols = jnp.full_like(vols, jnp.inf)
            negd, oidx = lax.top_k(-vols, k)
            d_slots.append(-negd)
            base = comp[:, t, m][:, ::stride0, ::stride0, :]  # (B,nH,nW,2)
            off_sel = offs[oidx]  # (B, nH, nW, k, 2)
            dt = jnp.full(off_sel.shape[:-1] + (1,), float(tj - t), vid.dtype)
            i_slots.append(
                jnp.concatenate([dt, base[..., None, :] + off_sel], axis=-1)
            )
        all_d.append(jnp.stack(d_slots, axis=3))  # (B, nH, nW, 2wt, k)
        all_i.append(jnp.stack(i_slots, axis=3))
    dists = jnp.stack(all_d, axis=1)
    inds = jnp.stack(all_i, axis=1)
    return dists, inds


def _upsample_inds(field, H, W, stride0):
    """Nearest-neighbor upsample a (nH, nW, ...) per-query field to (H, W, ...)."""
    if stride0 == 1:
        return field[:H, :W]
    up = jnp.repeat(jnp.repeat(field, stride0, axis=0), stride0, axis=1)
    return up[:H, :W]


def refine_search(vid0, vid1, inds, wt, ps, stride0=1):
    """Re-evaluate patch distances at given inds between vid0 and vid1
    (RefineSearch with wr=1, k=-1: no re-search, keep all offsets).

    vid0/vid1: (B, T, H, W, C); inds: (B, T, nH, nW, S, k, 3) from
    non_local_search. Returns dists (B, T, nH, nW, S, k).
    """
    B, T, H, W, C = vid0.shape
    S, K = inds.shape[4], inds.shape[5]
    out = jnp.zeros((B, T, inds.shape[2], inds.shape[3], S, K), vid0.dtype)
    for t in range(T):
        frames = time_window_frames(t, wt, T)
        for m in range(S):
            tj = frames[m] if m < len(frames) else t
            for kk in range(K):
                ind = inds[:, t, :, :, m, kk, :]  # (B, nH, nW, 3)
                flow = jax.vmap(lambda f: _upsample_inds(f, H, W, stride0))(
                    ind[..., 1:3]
                )

                def pair(v0t, v1j, fl):
                    w = flow_warp_reflect(v1j, fl)
                    d2 = jnp.sum((v0t - w) ** 2, axis=-1)
                    return box_filter_sum(d2, ps)[::stride0, ::stride0]

                d = jax.vmap(pair)(vid0[:, t], vid1[:, tj], flow)
                out = out.at[:, t, :, :, m, kk].set(d)
    return out


def paired_refine(src, tgt, flow, ps, stride0=1):
    """Patch distance between two frames at given flow offsets
    (stnls.search.PairedRefine with wr=1, warped_loss.py:228-236).

    src/tgt: (H, W, C); flow: (H, W, 2) or (nH, nW, 2) at the stride0 grid.
    Returns dists (nH, nW).
    """
    H, W, C = src.shape
    if flow.shape[0] != H:
        flow = _upsample_inds(flow, H, W, stride0)
    w = flow_warp_reflect(tgt, flow)
    d2 = jnp.sum((src - w) ** 2, axis=-1)
    return box_filter_sum(d2, ps)[::stride0, ::stride0]


def non_local_stack(vid, inds, wt, stride0=1):
    """Stack aligned frames at the search offsets (stnls.agg.NonLocalStack,
    stnls_loss.py:79,390).

    vid: (B, T, H, W, C); inds: (B, T, nH, nW, S, k, 3).
    Returns (B, S*k, T, H, W, C): entry (m, kk) is frame tj(m) of the window
    warped onto frame t by the (kk)-th offset field.
    """
    B, T, H, W, C = vid.shape
    S, K = inds.shape[4], inds.shape[5]
    stacks = []
    for m in range(S):
        for kk in range(K):
            per_t = []
            for t in range(T):
                frames = time_window_frames(t, wt, T)
                tj = frames[m] if m < len(frames) else t
                flow = jax.vmap(
                    lambda f: _upsample_inds(f, H, W, stride0)
                )(inds[:, t, :, :, m, kk, 1:3])
                per_t.append(jax.vmap(flow_warp_reflect)(vid[:, tj], flow))
            stacks.append(jnp.stack(per_t, axis=1))
    return jnp.stack(stacks, axis=1)


def refine_flow_search(src, tgt, flow, ws, ps, stride0=1):
    """Single-pair refinement used by WarpedLoss.update_stnls_flow
    (warped_loss.py:250-269): search the ws x ws window around ``flow`` between
    src and tgt, return the best distance and refined flow per query.

    src/tgt: (H, W, C); flow: (H, W, 2). Returns (dists (H, W, 1) upsampled,
    refined flow (H, W, 2)).
    """
    H, W, C = src.shape
    vols, offs = _pair_cost_volume(src, tgt, flow, ws, ps)
    best = jnp.argmin(vols, axis=-1)  # (H, W)
    dists = jnp.take_along_axis(vols, best[..., None], axis=-1)
    refined = flow + offs[best]
    return dists, refined


def fold_patches(patches, shape, stride0=1):
    """Scatter-add ps x ps patches back to a video with a weight (count) map —
    the stnls ``iFoldz`` equivalent (stnls_loss.py:629): returns (vid, wvid)
    so callers divide for the overlap-normalized reconstruction.

    patches: (B, T, nH, nW, ps, ps, C) patches whose centers sit on the
    stride0 query grid. shape: target (B, T, H, W, C).
    """
    B, T, H, W, C = shape
    _, _, nH, nW, ps, _, _ = patches.shape
    r = ps // 2
    vid = jnp.zeros((B, T, H + 2 * r, W + 2 * r, C), patches.dtype)
    wvid = jnp.zeros((B, T, H + 2 * r, W + 2 * r, 1), patches.dtype)
    ones = jnp.ones((B, T, nH, nW, 1), patches.dtype)
    for dy in range(ps):
        for dx in range(ps):
            vals = patches[:, :, :, :, dy, dx, :]  # (B,T,nH,nW,C)
            ys = jnp.arange(nH) * stride0 + dy
            xs = jnp.arange(nW) * stride0 + dx
            vid = vid.at[:, :, ys[:, None], xs[None, :], :].add(
                vals, mode="drop")
            wvid = wvid.at[:, :, ys[:, None], xs[None, :], :].add(
                ones, mode="drop")
    return vid[:, :, r : r + H, r : r + W, :], wvid[:, :, r : r + H, r : r + W, :]


def unfold_k(vid, inds, ps, wt, stride0=1):
    """Extract ps x ps patches at the search offsets (stnls.UnfoldK,
    stnls_loss.py:496): returns (B, T, nH, nW, S, k, ps, ps, C) patches of
    ``vid`` at the matched positions (reflect bounds)."""
    B, T, H, W, C = vid.shape
    S, K = inds.shape[4], inds.shape[5]
    r = ps // 2
    out = []
    for dy in range(-r, r + 1):
        row = []
        for dx in range(-r, r + 1):
            shifted = jnp.zeros((B, T, inds.shape[2], inds.shape[3], S, K, C),
                                vid.dtype)
            for t in range(T):
                frames = time_window_frames(t, wt, T)
                for m in range(S):
                    tj = frames[m] if m < len(frames) else t
                    for kk in range(K):
                        flow = jax.vmap(
                            lambda f: _upsample_inds(f, H, W, stride0)
                        )(inds[:, t, :, :, m, kk, 1:3])
                        off = jnp.asarray([dx, dy], flow.dtype)
                        w = jax.vmap(flow_warp_reflect)(vid[:, tj], flow + off)
                        shifted = shifted.at[:, t, :, :, m, kk].set(
                            w[:, ::stride0, ::stride0]
                        )
            row.append(shifted)
        out.append(jnp.stack(row, axis=-2))
    patches = jnp.stack(out, axis=-3)  # (..., ps(dy), ps(dx), C)
    return patches
