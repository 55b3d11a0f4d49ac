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

def scale_grad(x, scale):
    """Identity forward; multiplies the cotangent by ``scale`` on backward.

    Implements the stnls kernels' ``normalize_bwd`` option (reference
    stnls_loss.py:279,287): with scale = 1/ps^2 the gradient flowing into the
    video operands of a patch search is normalized by the patch element
    count, making gradient magnitude patch-size invariant while leaving the
    forward distances untouched.
    """

    @jax.custom_vjp
    def _f(x):
        return x

    _f.defvjp(lambda x: (x, None), lambda _, g: (g * scale,))
    return _f(x)


def _reflect_idx(i, n):
    """Reflect index into [0, n) (mirror without repeating the edge)."""
    i = jnp.abs(i)
    period = 2 * n - 2 if n > 1 else 1
    i = i % period
    return jnp.where(i >= n, period - i, i)


def bilinear_sample_reflect(img, sx, sy):
    """Bilinear sample of img (H, W, C) at float coords (sx, sy) with
    reflecting boundary; sx/sy may have ANY shape (the output is
    sx.shape + (C,))."""
    H, W, C = img.shape
    shp = sx.shape
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
        return jnp.take(flat, (iy * W + ix).ravel(), axis=0).reshape(shp + (C,))

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


def compose_flow_pyramids(fflow, bflow, depth):
    """Cumulative composed flows: returns (comp_f, comp_b), each
    (depth, B, T, H, W, 2), where comp_f[d-1, :, t] maps frame t to frame
    t + d (and comp_b to t - d). Multi-step flows chain by warping the next
    hop's flow by the accumulated flow (stnls.nn.search_flow equivalent).

    ``depth`` must cover the largest |dt| a consumer's window can reach —
    clamped windows at sequence ends contain targets up to 2*wt away, so
    search_flow_compose builds depth 2*wt. Entries whose target would leave
    [0, T) are never consumed by valid window slots; they compose with
    edge-clamped hops and are harmless.
    """
    B, T, H, W, _ = fflow.shape
    warp_flow = jax.vmap(jax.vmap(flow_warp_reflect))  # over (B, T)

    # unrolled cumulative build (depth is small and static)
    def build(flows, sign):
        accs = [flows]
        for d in range(1, depth):
            idx = jnp.clip(jnp.arange(T) + sign * d, 0, T - 1)
            nxt = warp_flow(jnp.take(flows, idx, axis=1), accs[-1])
            accs.append(accs[-1] + nxt)
        return jnp.stack(accs, axis=0)  # (depth, B, T, H, W, 2)

    return build(fflow, +1), build(bflow, -1)


def search_flow_compose(fflow, bflow, wt, tables=None):
    """Composed flows from every frame to every frame of its +/-wt window.

    fflow/bflow: (B, T, H, W, 2); fflow[t] maps t -> t+1, bflow[t] maps
    t -> t-1. Returns (B, T, 2*wt, H, W, 2) where slot m is the flow from t to
    ``time_window_frames(t, wt, T)[m]``.

    ``tables``: optional (tj, valid) arrays of shape (T, 2*wt) overriding the
    default window layout — used by time-sharded execution, where the window
    targets come from GLOBAL frame indices translated into the local halo
    block (parallel/shard.py) and may be traced values.
    """
    B, T, H, W, _ = fflow.shape
    S = 2 * wt
    if tables is None:
        tj_tab, valid_tab = _window_tables(T, wt)
    else:
        tj_tab, valid_tab = tables
    # clamped windows at sequence ends reach targets up to 2*wt away, so
    # the pyramids must go to depth 2*wt (a depth-wt pyramid silently
    # substituted the distance-wt flow for those slots: ~1 px error at
    # the first/last wt frames of every sequence)
    comp_f, comp_b = compose_flow_pyramids(fflow, bflow, 2 * wt)
    # stack [backward 2wt..1, zero, forward 1..2wt] so slot dt in
    # [-2wt, 2wt] selects pyramid level |dt| of the right direction
    zero = jnp.zeros_like(comp_f[:1])
    stackfb = jnp.concatenate([comp_b[::-1], zero, comp_f], axis=0)
    dt = tj_tab - jnp.arange(T, dtype=tj_tab.dtype)[:, None]  # (T, S)
    sel = jnp.clip(dt + 2 * wt, 0, 4 * wt)  # index into stackfb's first axis

    # gather: out[b, t, m] = stackfb[sel[t, m], b, t]
    def pick_tm(t, m):
        return stackfb[sel[t, m], :, t]

    out = jax.vmap(lambda t: jax.vmap(lambda m: pick_tm(t, m))(
        jnp.arange(S)))(jnp.arange(T))  # (T, S, B, H, W, 2)
    out = jnp.moveaxis(out, 2, 0)  # (B, T, S, H, W, 2)
    mask = valid_tab.astype(out.dtype)[None, :, :, None, None, None]
    return out * mask


def _window_tables(T, wt):
    """Static per-(t, slot) tables: target frame, validity (padded slots of
    short sequences are invalid and get +inf distances)."""
    import numpy as np

    S = 2 * wt
    tj = np.zeros((T, S), np.int32)
    valid = np.zeros((T, S), np.bool_)
    for t in range(T):
        frames = time_window_frames(t, wt, T)
        for m in range(S):
            if m < len(frames):
                tj[t, m], valid[t, m] = frames[m], True
            else:
                tj[t, m] = t
    return jnp.asarray(tj), jnp.asarray(valid)


def _search_offsets(ws, dtype=jnp.float32):
    """(ws*ws, 2) float (dx, dy) window offsets, row-major over dy then dx."""
    r = ws // 2
    dys, dxs = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                            indexing="ij")
    return jnp.stack([dxs, dys], axis=-1).reshape(ws * ws, 2).astype(dtype)


def non_local_search(vid, flows, ws, wt, ps, k, stride0=1, srch_vid=None,
                     tables=None):
    """Top-k non-local search of ``vid`` against itself (or ``srch_vid``)
    guided by flows.

    vid: (B, T, H, W, C); flows: Config/dict with fflow/bflow or a
    precomposed (B, T, 2*wt, H, W, 2) array.
    Returns (dists, inds):
      dists: (B, T, nH, nW, 2*wt, k)
      inds:  (B, T, nH, nW, 2*wt, k, 3)  — float (dt, dx, dy) offsets
    Top-k is per window frame (stnls topk_mode="each"); the reference frame is
    excluded (self_action="remove_ref_frame").

    ``tables``: optional (tj, valid) (T, 2*wt) window override (may be traced)
    for time-sharded halo blocks (parallel/shard.py).

    Scaling: the ws*ws window is a ``lax.scan`` carrying a streaming top-k
    (O(k) memory per query, no (H, W, ws^2) cost volume), and the (t, slot)
    pairs are another scan — trace and compile time are O(1) in ws, wt and T.
    """
    if srch_vid is None:
        srch_vid = vid
    B, T, H, W, C = vid.shape
    if hasattr(flows, "fflow") or (isinstance(flows, dict) and "fflow" in flows):
        comp = search_flow_compose(flows["fflow"], flows["bflow"], wt,
                                   tables=tables)
    else:
        comp = flows
    S = 2 * wt
    tj_tab, valid_tab = _window_tables(T, wt) if tables is None else tables
    offs = _search_offsets(ws, vid.dtype)
    nH = -(-H // stride0)
    nW = -(-W // stride0)
    warp_b = jax.vmap(flow_warp_reflect)
    box_b = jax.vmap(partial(box_filter_sum, ps=ps))

    def tm_step(_, xs):
        t, tj, valid, fl = xs  # fl: (B, H, W, 2)
        v0 = jnp.take(vid, t, axis=1)
        v1 = jnp.take(srch_vid, tj, axis=1)

        def off_step(carry, o):
            d_best, o_best = carry
            w = warp_b(v1, fl + o)
            vol = box_b(jnp.sum((v0 - w) ** 2, axis=-1))
            vol = vol[:, ::stride0, ::stride0]  # (B, nH, nW)
            d_cat = jnp.concatenate([d_best, vol[..., None]], axis=-1)
            o_new = jnp.broadcast_to(o, (B, nH, nW, 1, 2))
            o_cat = jnp.concatenate([o_best, o_new], axis=-2)
            negd, idx = lax.top_k(-d_cat, k)
            o_sel = jnp.take_along_axis(o_cat, idx[..., None], axis=-2)
            return (-negd, o_sel), None

        init = (jnp.full((B, nH, nW, k), jnp.inf, vid.dtype),
                jnp.zeros((B, nH, nW, k, 2), vid.dtype))
        (d, o_sel), _ = lax.scan(off_step, init, offs)
        d = jnp.where(valid, d, jnp.inf)
        base = fl[:, ::stride0, ::stride0, :]
        dt = jnp.broadcast_to((tj - t).astype(vid.dtype),
                              (B, nH, nW, k))[..., None]
        inds = jnp.concatenate([dt, base[..., None, :] + o_sel], axis=-1)
        return 0, (d, inds)

    t_arr = jnp.repeat(jnp.arange(T, dtype=jnp.int32), S)
    tj_arr = tj_tab.reshape(T * S)
    valid_arr = valid_tab.reshape(T * S)
    comp_flat = jnp.moveaxis(comp, (1, 2), (0, 1)).reshape(T * S, B, H, W, 2)
    _, (D, I) = lax.scan(tm_step, 0, (t_arr, tj_arr, valid_arr, comp_flat))
    dists = jnp.moveaxis(D.reshape(T, S, B, nH, nW, k), (0, 1, 2), (1, 4, 0))
    inds = jnp.moveaxis(I.reshape(T, S, B, nH, nW, k, 3), (0, 1, 2), (1, 4, 0))
    return dists, inds


def _upsample_inds(field, H, W, stride0):
    """Nearest-neighbor upsample a (nH, nW, ...) per-query field to (H, W, ...)."""
    if stride0 == 1:
        return field[:H, :W]
    up = jnp.repeat(jnp.repeat(field, stride0, axis=0), stride0, axis=1)
    return up[:H, :W]


def _flat_tmk(inds, wt, T, tables=None):
    """Flatten (t, slot, k) into one mapped axis: returns (t_arr, tj_arr,
    ind_flat) with ind_flat (T*S*K, B, nH, nW, 3)."""
    B, _, nH, nW, S, K, _ = inds.shape
    tj_tab = (_window_tables(T, wt) if tables is None else tables)[0]
    t_arr = jnp.repeat(jnp.arange(T, dtype=jnp.int32), S * K)
    tj_arr = jnp.repeat(tj_tab.reshape(T * S), K)
    ind_flat = jnp.moveaxis(inds, (1, 4, 5), (0, 1, 2)).reshape(
        T * S * K, B, nH, nW, 3)
    return t_arr, tj_arr, ind_flat


def refine_search(vid0, vid1, inds, wt, ps, stride0=1, tables=None):
    """Re-evaluate patch distances at given inds between vid0 and vid1
    (RefineSearch with wr=1, k=-1: no re-search, keep all offsets).

    vid0/vid1: (B, T, H, W, C); inds: (B, T, nH, nW, S, k, 3) from
    non_local_search. Returns dists (B, T, nH, nW, S, k).

    Scaling: one ``lax.map`` over the flattened (t, slot, k) axis — trace and
    compile are O(1) in T, S and k.
    """
    B, T, H, W, C = vid0.shape
    _, _, nH, nW, S, K, _ = inds.shape
    t_arr, tj_arr, ind_flat = _flat_tmk(inds, wt, T, tables)

    def body(xs):
        t, tj, ind = xs
        v0 = jnp.take(vid0, t, axis=1)
        v1 = jnp.take(vid1, tj, axis=1)
        flow = jax.vmap(lambda f: _upsample_inds(f, H, W, stride0))(
            ind[..., 1:3])

        def pair(v0t, v1j, fl):
            w = flow_warp_reflect(v1j, fl)
            d2 = jnp.sum((v0t - w) ** 2, axis=-1)
            return box_filter_sum(d2, ps)[::stride0, ::stride0]

        return jax.vmap(pair)(v0, v1, flow)  # (B, nH, nW)

    D = lax.map(body, (t_arr, tj_arr, ind_flat))  # (T*S*K, B, nH, nW)
    return jnp.moveaxis(D.reshape(T, S, K, B, nH, nW), (0, 1, 2, 3),
                        (1, 4, 5, 0))


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


def non_local_stack(vid, inds, wt, stride0=1, tables=None):
    """Stack aligned frames at the search offsets (stnls.agg.NonLocalStack,
    stnls_loss.py:79,390).

    vid: (B, T, H, W, C); inds: (B, T, nH, nW, S, k, 3).
    Returns (B, S*k, T, H, W, C): entry (m, kk) is frame tj(m) of the window
    warped onto frame t by the (kk)-th offset field.

    Scaling: one ``lax.map`` over the flattened (t, slot, k) axis.
    """
    B, T, H, W, C = vid.shape
    S, K = inds.shape[4], inds.shape[5]
    t_arr, tj_arr, ind_flat = _flat_tmk(inds, wt, T, tables)

    def body(xs):
        t, tj, ind = xs
        flow = jax.vmap(lambda f: _upsample_inds(f, H, W, stride0))(
            ind[..., 1:3])
        return jax.vmap(flow_warp_reflect)(jnp.take(vid, tj, axis=1), flow)

    Wrp = lax.map(body, (t_arr, tj_arr, ind_flat))  # (T*S*K, B, H, W, C)
    # (T, S, K, B, H, W, C) -> (B, S, K, T, H, W, C) -> (B, S*K, T, H, W, C)
    out = jnp.moveaxis(Wrp.reshape(T, S, K, B, H, W, C), (0, 1, 2, 3),
                       (3, 1, 2, 0))
    return out.reshape(B, S * K, T, H, W, C)


def refine_flow_search(src, tgt, flow, ws, ps, stride0=1):
    """Single-pair refinement used by WarpedLoss.update_stnls_flow
    (warped_loss.py:250-269): search the ws x ws window around ``flow`` between
    src and tgt, return the best distance and refined flow per query.

    src/tgt: (H, W, C); flow: (H, W, 2). Returns (dists (H, W, 1) upsampled,
    refined flow (H, W, 2)).

    Streaming argmin over the ws*ws window (lax.scan): O(1) trace in ws.
    """
    H, W, C = src.shape
    offs = _search_offsets(ws, flow.dtype)

    def off_step(carry, o):
        d_best, o_best = carry
        w = flow_warp_reflect(tgt, flow + o)
        d = box_filter_sum(jnp.sum((src - w) ** 2, axis=-1), ps)
        better = d < d_best
        return (jnp.where(better, d, d_best),
                jnp.where(better[..., None], o, o_best)), None

    init = (jnp.full((H, W), jnp.inf, src.dtype),
            jnp.zeros((H, W, 2), flow.dtype))
    (dists, o_best), _ = lax.scan(off_step, init, offs)
    return dists[..., None], flow + o_best


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


def unfold_k(vid, inds, ps, wt, stride0=1, tables=None):
    """Extract ps x ps patches at the search offsets (stnls.UnfoldK,
    stnls_loss.py:496): returns (B, T, nH, nW, S, k, ps, ps, C) patches of
    ``vid`` at the matched positions (reflect bounds).

    Scaling: one ``lax.map`` over the flattened (t, slot, k) axis; all ps*ps
    patch pixels of a step sample in ONE generalized bilinear gather — trace
    and compile are O(1) in T, S, k and ps.
    """
    B, T, H, W, C = vid.shape
    _, _, nH, nW, S, K, _ = inds.shape
    r = ps // 2
    t_arr, tj_arr, ind_flat = _flat_tmk(inds, wt, T, tables)
    dys, dxs = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=vid.dtype),
                            jnp.arange(-r, r + 1, dtype=vid.dtype),
                            indexing="ij")  # (ps, ps), patch dims (dy, dx)
    qx = (jnp.arange(nW) * stride0).astype(vid.dtype)
    qy = (jnp.arange(nH) * stride0).astype(vid.dtype)

    def body(xs):
        t, tj, ind = xs
        frame = jnp.take(vid, tj, axis=1)  # (B, H, W, C)
        sx = (qx[None, :, None, None] + ind[..., 1][..., None, None]
              + dxs[None, None])  # (B via ind, nH? ...)
        sy = (qy[:, None, None, None] + ind[..., 2][..., None, None]
              + dys[None, None])

        def sample(fr, sx1, sy1):
            return bilinear_sample_reflect(fr, sx1, sy1)

        return jax.vmap(sample)(frame, sx, sy)  # (B, nH, nW, ps, ps, C)

    P = lax.map(body, (t_arr, tj_arr, ind_flat))
    return jnp.moveaxis(P.reshape(T, S, K, B, nH, nW, ps, ps, C),
                        (0, 1, 2, 3), (1, 4, 5, 0))
