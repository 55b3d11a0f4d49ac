"""Farneback flow (ftype="cv2") behavioral oracles.

cv2 itself is unavailable in this environment, so parity is pinned the way
the harness consumes flows: known-translation recovery (integer and
subpixel), and the flow/api dispatch semantics (cv2 = a genuinely different
estimator; svnlb = documented TV-L1 alias). Reference call sites:
lib/frame2frame/lightning.py:303, lib/frame2frame/test.py:162.
"""

import numpy as np
import pytest


def _textured(h, w, pad, seed=0):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    base = np.zeros((h + 2 * pad, w + 2 * pad))
    for s, amp in ((1.0, 0.5), (2.0, 1.0), (4.0, 2.0), (8.0, 4.0)):
        base += amp * gaussian_filter(rng.standard_normal(base.shape), s)
    base = 255 * (base - base.min()) / np.ptp(base)
    return base.astype(np.float32)


def _interior(err, margin=18):
    return err[margin:-margin, margin:-margin]


def test_integer_translation_recovered():
    from frame2frame_tpu.flow.farneback import make_farneback_solver

    h, w, pad = 96, 128, 8
    base = _textured(h, w, pad)
    sx, sy = 2, -1
    I0 = base[pad:pad + h, pad:pad + w]
    # I1(p) = I0(p - s)  =>  I0(p) = I1(p + s): expected flow = (sx, sy)
    I1 = base[pad - sy:pad - sy + h, pad - sx:pad - sx + w]
    solver = make_farneback_solver(w, h, levels=3)
    flow = np.asarray(solver(I0, I1))
    ex = _interior(flow[..., 0] - sx)
    ey = _interior(flow[..., 1] - sy)
    assert abs(np.median(ex)) < 0.1 and abs(np.median(ey)) < 0.1
    assert np.mean(np.hypot(ex, ey)) < 0.35


def test_subpixel_translation_recovered():
    from frame2frame_tpu.flow.farneback import make_farneback_solver

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def img(ox, oy):
        v = (np.sin(0.23 * (xx + ox)) + np.cos(0.31 * (yy + oy))
             + 0.5 * np.sin(0.11 * (xx + ox) + 0.17 * (yy + oy)))
        return (127.5 + 50 * v).astype(np.float32)

    sx, sy = 0.6, -0.4
    # I1(p) = I0(p - s): evaluate the analytic image at shifted phase
    I0, I1 = img(0, 0), img(-sx, -sy)
    solver = make_farneback_solver(w, h, levels=2)
    flow = np.asarray(solver(I0, I1))
    ex = _interior(flow[..., 0] - sx)
    ey = _interior(flow[..., 1] - sy)
    assert abs(np.median(ex)) < 0.15 and abs(np.median(ey)) < 0.15


def test_run_flows_cv2_dispatch_and_conventions():
    from frame2frame_tpu.flow.api import run_flows

    h, w, pad, T = 64, 80, 6, 3
    base = _textured(h, w, pad, seed=3)
    vid = np.stack([base[pad + t:pad + t + h, pad + t:pad + t + w]
                    for t in range(T)])[..., None]
    out = run_flows(vid, ftype="cv2", levels=3)
    assert out.fflow.shape == (1, T, h, w, 2)
    assert out.bflow.shape == (1, T, h, w, 2)
    # frame t+1 samples base one pixel further: frame_{t+1}(p) =
    # frame_t(p+1), i.e. frame_t(p) = frame_{t+1}(p-1), so fflow ~ (-1,-1)
    # and bflow ~ (+1,+1); boundary frames zero (lightning.py:299-301)
    assert np.allclose(out.fflow[0, -1], 0) and np.allclose(out.bflow[0, 0], 0)
    ff = np.asarray(out.fflow[0, 0])[16:-16, 16:-16]
    bf = np.asarray(out.bflow[0, 1])[16:-16, 16:-16]
    assert abs(np.median(ff[..., 0]) + 1) < 0.25
    assert abs(np.median(ff[..., 1]) + 1) < 0.25
    assert abs(np.median(bf[..., 0]) - 1) < 0.25
    assert abs(np.median(bf[..., 1]) - 1) < 0.25


def test_svnlb_is_tvl1_alias_and_cv2_differs():
    from frame2frame_tpu.flow.api import run_flows

    h, w, pad, T = 48, 64, 6, 2
    base = _textured(h, w, pad, seed=5)
    vid = np.stack([base[pad + t:pad + t + h, pad + t:pad + t + w]
                    for t in range(T)])[..., None]
    tv = run_flows(vid, ftype="tvl1")
    sv = run_flows(vid, ftype="svnlb")
    np.testing.assert_array_equal(np.asarray(tv.bflow), np.asarray(sv.bflow))
    cv = run_flows(vid, ftype="cv2", levels=2)
    assert not np.array_equal(np.asarray(cv.bflow), np.asarray(tv.bflow))


def test_unknown_ftype_raises():
    from frame2frame_tpu.flow.api import run_flows

    with pytest.raises(ValueError):
        run_flows(np.zeros((2, 8, 8), np.float32), ftype="nope")
