"""Non-local search (stnls-equivalent) tests: the cost-volume search must find
exact translations, refine must score matched offsets near zero, and flow
composition must chain correctly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame2frame_tpu.config import Config
from frame2frame_tpu.ops import nls


@pytest.fixture(scope="module")
def shifted_video():
    """3-frame video translating by (+2 x, +1 y) per frame, smooth texture."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    H = W = 32
    base = gaussian_filter(rng.random((H + 16, W + 16)), 2.0).astype(np.float32)
    frames = [base[4 + t : 4 + t + H, 8 - 2 * t : 8 - 2 * t + W] for t in range(3)]
    # content moves: frame t+1 at (y,x) == frame t at (y+1, x-2)
    vid = np.stack(frames)[None, ..., None]
    return jnp.asarray(vid)


def test_search_finds_translation(shifted_video):
    vid = shifted_video
    B, T, H, W, C = vid.shape
    zeros = jnp.zeros((B, T, H, W, 2))
    flows = Config(fflow=zeros, bflow=zeros)
    dists, inds = nls.non_local_search(vid, flows, ws=7, wt=1, ps=5, k=1,
                                       stride0=1)
    # frame 1 -> frame 2 (window slot for tj=2): content of frame1 at (y,x)
    # appears in frame2 at (y-1, x+2) => offset (dx=+2, dy=-1)
    # find the slot where dt=+1
    ind_t1 = np.asarray(inds[0, 1])  # (H, W, 2, k, 3)
    dts = ind_t1[H // 2, W // 2, :, 0, 0]
    slot = int(np.argmax(dts == 1.0))
    inner = ind_t1[8:-8, 8:-8, slot, 0]
    assert np.median(inner[..., 1]) == pytest.approx(2.0, abs=0.5)
    assert np.median(inner[..., 2]) == pytest.approx(-1.0, abs=0.5)
    # the matched distance is near zero
    d = np.asarray(dists[0, 1, 8:-8, 8:-8, slot, 0])
    assert np.median(d) < 1e-3


def test_refine_scores_match(shifted_video):
    vid = shifted_video
    B, T, H, W, C = vid.shape
    zeros = jnp.zeros((B, T, H, W, 2))
    flows = Config(fflow=zeros, bflow=zeros)
    _, inds = nls.non_local_search(vid, flows, ws=7, wt=1, ps=5, k=1, stride0=1)
    dists = nls.refine_search(vid, vid, inds, wt=1, ps=5, stride0=1)
    d = np.asarray(dists[0, 1, 8:-8, 8:-8])
    assert np.median(d) < 1e-3


def test_search_flow_compose_chain():
    """Two-hop composition: constant flow fields chain additively."""
    B, T, H, W = 1, 4, 16, 16
    fflow = jnp.ones((B, T, H, W, 2)) * jnp.asarray([1.0, 0.0])
    bflow = -fflow
    comp = nls.search_flow_compose(fflow, bflow, wt=2)
    # frame 0's window frames are [1, 2] (wait: ti=0, wt=2 -> window [0..4],
    # non-ref [1,2,3,4] clipped by window size 2*wt=4)
    frames0 = nls.time_window_frames(0, 2, T)
    assert frames0 == [1, 2, 3]
    # flow 0->2 should be ~(2, 0) in the interior
    slot = frames0.index(2)
    c = np.asarray(comp[0, 0, slot])
    assert np.allclose(c[4:-4, 4:-4, 0], 2.0, atol=1e-4)


def test_paired_refine_zero_for_identical():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((16, 16, 1)).astype(np.float32))
    flow = jnp.zeros((16, 16, 2))
    d = nls.paired_refine(img, img, flow, ps=3)
    assert float(jnp.max(jnp.abs(d))) < 1e-10


def test_non_local_stack_aligns(shifted_video):
    vid = shifted_video
    B, T, H, W, C = vid.shape
    zeros = jnp.zeros((B, T, H, W, 2))
    flows = Config(fflow=zeros, bflow=zeros)
    _, inds = nls.non_local_search(vid, flows, ws=7, wt=1, ps=5, k=1, stride0=1)
    stack = nls.non_local_stack(vid, inds, wt=1)
    assert stack.shape[:2] == (B, 2)  # S*k = 2*1
    # stacked neighbor should closely match the reference frame (aligned)
    err = np.abs(np.asarray(stack[0, 0, 1, 8:-8, 8:-8] - vid[0, 1, 8:-8, 8:-8]))
    assert err.mean() < 0.02


def test_dnls_loss_runs(shifted_video):
    from frame2frame_tpu.losses.stnls import DnlsLoss

    vid = shifted_video
    B, T, H, W, C = vid.shape
    zeros = jnp.zeros((B, T, H, W, 2))
    flows = Config(fflow=zeros, bflow=zeros)
    noisy = vid + 0.05
    crit = DnlsLoss(ws=5, wt=1, ps=5, ps_dists=-1, k=2, stride0=2,
                    dist_crit="v0", search_input="deno", nepochs=10,
                    dist_mask=0.5)
    loss = crit(noisy, vid, vid, flows, curr_epoch=0)
    assert np.isfinite(float(loss))
    # perfect deno vs noisy at matched offsets: loss ~ noise level
    assert float(loss) < 1.0


def test_dnls_loss_grad_flows(shifted_video):
    from frame2frame_tpu.losses.stnls import DnlsLoss

    vid = shifted_video
    B, T, H, W, C = vid.shape
    zeros = jnp.zeros((B, T, H, W, 2))
    flows = Config(fflow=zeros, bflow=zeros)
    noisy = vid + 0.05
    crit = DnlsLoss(ws=3, wt=1, ps=3, k=1, stride0=4, dist_crit="v0",
                    nepochs=10, dist_mask=0.5)

    def f(deno):
        return crit(noisy, vid, deno, flows, curr_epoch=0)

    g = jax.grad(f)(vid)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_fold_patches_reconstructs():
    """unfold at stride 1 around self-inds + fold == (count-weighted) identity."""
    from frame2frame_tpu.ops.nls import fold_patches

    rng = np.random.default_rng(5)
    B, T, H, W, C = 1, 1, 8, 8, 1
    vid = jnp.asarray(rng.random((B, T, H, W, C)).astype(np.float32))
    ps = 3
    # patches extracted densely (stride0=1) at zero offsets: patch (i,j) is the
    # 3x3 neighborhood of pixel (i,j) with reflect bounds
    padded = jnp.pad(vid, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    patches = jnp.stack(
        [jnp.stack([padded[:, :, dy:dy + H, dx:dx + W, :] for dx in range(3)],
                   axis=4)
         for dy in range(3)], axis=4,
    )
    # patches: (B, T, H, W, ps_dy, ps_dx, C)
    out, w = fold_patches(patches, (B, T, H, W, C), stride0=1)
    recon = np.asarray(out / w)
    # interior pixels: average of the 9 patches containing them == pixel value
    np.testing.assert_allclose(recon[:, :, 2:-2, 2:-2], np.asarray(vid)[:, :, 2:-2, 2:-2],
                               rtol=1e-5, atol=1e-6)


def test_nls_scales_to_realistic_shapes():
    """Regression for trace-time scaling (round-1 weakness): reference-scale
    settings (ws=15, wt=3, T=10, k=5, 256^2) must trace+compile in seconds.
    The scan/map formulation is O(1) trace size in ws/wt/T/k/ps; the old
    Python-unrolled form produced multi-thousand-op traces here."""
    import time
    from functools import partial

    from frame2frame_tpu.ops.nls import (
        non_local_search,
        refine_search,
        unfold_k,
    )

    B, T, H, W, C = 1, 10, 256, 256, 1
    wt, ws, ps, k, stride0 = 3, 15, 7, 5, 8
    vid = jax.ShapeDtypeStruct((B, T, H, W, C), jnp.float32)
    comp = jax.ShapeDtypeStruct((B, T, 2 * wt, H, W, 2), jnp.float32)
    nH = -(-H // stride0)
    inds = jax.ShapeDtypeStruct((B, T, nH, nH, 2 * wt, k, 3), jnp.float32)

    t0 = time.time()
    nls = jax.jit(partial(non_local_search, ws=ws, wt=wt, ps=ps, k=k,
                          stride0=stride0)).lower(vid, comp).compile()
    rs = jax.jit(partial(refine_search, wt=wt, ps=ps,
                         stride0=stride0)).lower(vid, vid, inds).compile()
    uk = jax.jit(partial(unfold_k, ps=ps, wt=wt,
                         stride0=stride0)).lower(vid, inds).compile()
    dt = time.time() - t0
    assert dt < 120.0, f"trace+compile took {dt:.1f}s"
    del nls, rs, uk


def test_search_flow_compose_boundary_two_hop():
    """Clamped windows at sequence ends reach distance-2wt targets; the
    composed flow for those slots must be the true multi-hop chain, not the
    distance-wt flow (regression: the depth-wt pyramid silently substituted
    it, ~1 px error at boundary frames)."""
    rng = np.random.default_rng(0)
    B, T, H, W = 1, 4, 12, 14
    fflow = jnp.asarray(rng.normal(0, 0.8, (B, T, H, W, 2)), jnp.float32)
    bflow = jnp.asarray(rng.normal(0, 0.8, (B, T, H, W, 2)), jnp.float32)
    wt = 1
    comp = nls.search_flow_compose(fflow, bflow, wt=wt)
    # t=0's clamped window is [1, 2]; slot 1 targets frame 2 (distance 2)
    assert nls.time_window_frames(0, wt, T) == [1, 2]
    expected = fflow[:, 0] + jax.vmap(nls.flow_warp_reflect)(
        fflow[:, 1], fflow[:, 0])
    np.testing.assert_allclose(np.asarray(comp[:, 0, 1]),
                               np.asarray(expected), rtol=1e-5, atol=1e-5)
    # t=T-1's window is [1, 2]; slot 0 targets frame 1 (distance 2 backward)
    assert nls.time_window_frames(T - 1, wt, T) == [1, 2]
    expected_b = bflow[:, 3] + jax.vmap(nls.flow_warp_reflect)(
        bflow[:, 2], bflow[:, 3])
    np.testing.assert_allclose(np.asarray(comp[:, 3, 0]),
                               np.asarray(expected_b), rtol=1e-5, atol=1e-5)
