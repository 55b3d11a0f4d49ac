"""In-pipeline optical-flow API for videos.

Replacement for the reference's two flow paths: the filesystem .flo interop
(tvl1flow.sh + readFlowFile.py) and the external ``dev_basics.flow.orun``
(lightning.py:303, test.py:162). Instead of one process spawn per frame pair,
all pairs of a video batch solve on-device in one vmapped jitted call.

Flow conventions (matching the harness fflow/bflow fields, lightning.py:299-301):
- ``fflow[t]`` maps frame t coordinates to frame t+1 positions (last frame: 0);
- ``bflow[t]`` maps frame t coordinates to frame t-1 positions (first frame: 0).

The denoising CLI consumes ``bflow`` of the current frame, matching
``tvl1flow.sh``'s ``out_bflow.flo % (i+1)`` = flow(I_{i+1} -> I_i).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import Config
from .tvl1 import DENOISING_PARAMS, make_batched_tvl1


def _to_gray_bt(vid):
    """(B,T,H,W,C)/(T,H,W,C)/(T,H,W) -> (B,T,H,W) luma-by-mean float."""
    vid = jnp.asarray(vid)
    if vid.ndim == 3:
        vid = vid[None, ..., None]
    elif vid.ndim == 4:
        vid = vid[None]
    return vid.mean(axis=-1)


def run_flows(vid, use_flow=True, ftype="tvl1", **params):
    """Compute fflow/bflow for a video.

    vid: (B, T, H, W, C) (or (T,H,W[,C])) in any consistent range (the solver
    normalizes each pair jointly, tvl1flow_lib.c:314-348).
    Returns Config(fflow=(B,T,H,W,2), bflow=(B,T,H,W,2)).

    ``use_flow=False`` returns zero flows, mirroring ``flow.orun(vid, False)``.

    ``ftype`` selects the estimator, like the reference's
    ``dev_basics.flow.orun(ftype=...)`` (lightning.py:303, test.py:162):

    - ``"tvl1"``: the multiscale dual TV-L1 solver (flow/tvl1.py), denoising
      params by default;
    - ``"cv2"``: Farneback polynomial-expansion flow (flow/farneback.py) —
      the algorithm family behind ``cv2.calcOpticalFlowFarneback``, which is
      what the reference's ``"cv2"`` ftype runs;
    - ``"svnlb"``: an explicit ALIAS of ``"tvl1"``. The reference's svnlb
      flow is the external VNLB package's bundled TV-L1 variant; this
      harness has one TV-L1. (Until round 5 all three names silently solved
      TV-L1 — the cv2 path is now a genuinely different estimator.)
    """
    g = _to_gray_bt(vid)
    B, T, H, W = g.shape
    zeros = jnp.zeros((B, T, H, W, 2), g.dtype)
    if not use_flow or T == 1:
        return Config(fflow=zeros, bflow=zeros)
    if ftype not in ("tvl1", "svnlb", "cv2"):
        raise ValueError(f"unknown flow type [{ftype}]")

    if ftype == "cv2":
        from .farneback import (DEFAULT_PARAMS, fb_params,
                                make_batched_farneback)

        kw = dict(DEFAULT_PARAMS)
        kw.update(fb_params(params))
        solver = make_batched_farneback(W, H, **kw)
    else:
        kw = dict(DENOISING_PARAMS)
        kw.update(params)
        # small frames: the denoising params' fscale=2 (stop 2 levels above
        # finest, tvl1flow.sh:12-18) can exceed the auto-clamped pyramid depth
        # (coarsest >= 16 px, main.c:159-163), which in the C code solves no
        # level at all (zero flow). The harness path clamps so at least the
        # coarsest level solves.
        from ..ops.pyramid import num_scales

        ns = num_scales(W, H, kw.get("nscales", 100), kw.get("zfactor", 0.5))
        if kw.get("fscale", 0) >= ns:
            kw["fscale"] = max(ns - 1, 0)
        solver = make_batched_tvl1(W, H, **kw)

    # forward: pairs (t, t+1) for t in 0..T-2 ; backward: (t, t-1) for t in
    # 1..T-1 — both directions solve in ONE batched call (a single vmapped
    # program instead of the reference's 2 process spawns per pair,
    # tvl1flow.sh:10-18)
    src_f = g[:, :-1].reshape(-1, H, W)
    dst_f = g[:, 1:].reshape(-1, H, W)
    both = solver(
        jnp.concatenate([src_f, dst_f], axis=0),
        jnp.concatenate([dst_f, src_f], axis=0),
    )
    P = src_f.shape[0]
    fflow = both[:P].reshape(B, T - 1, H, W, 2)
    bflow = both[P:].reshape(B, T - 1, H, W, 2)

    fflow = jnp.concatenate([fflow, jnp.zeros((B, 1, H, W, 2), g.dtype)], axis=1)
    bflow = jnp.concatenate([jnp.zeros((B, 1, H, W, 2), g.dtype), bflow], axis=1)
    return Config(fflow=fflow, bflow=bflow)


def orun(vid, use_flow=True, ftype="tvl1", **params):
    """dev_basics-style alias (reference lightning.py:303)."""
    return run_flows(vid, use_flow=use_flow, ftype=ftype, **params)


def precompute_flo_files(frames, out_tmpl, first=1, **params):
    """Batch-produce Middlebury .flo files like tvl1flow.sh (bflow naming):
    ``out_tmpl % (first + i + 1)`` holds flow(I_{i+1} -> I_i).

    frames: (T, H, W) numpy array in [0, 255].
    Returns list of written paths.
    """
    from ..io.flo import write_flo

    frames = np.asarray(frames)
    T, H, W = frames.shape
    kw = dict(DENOISING_PARAMS)
    kw.update(params)
    solver = make_batched_tvl1(W, H, **kw)
    flows = np.asarray(solver(jnp.asarray(frames[1:]), jnp.asarray(frames[:-1])))
    paths = []
    for i in range(T - 1):
        path = out_tmpl % (first + i + 1)
        write_flo(path, flows[i])
        paths.append(path)
    return paths
