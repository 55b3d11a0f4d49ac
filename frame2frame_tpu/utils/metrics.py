"""Quality metrics: PSNR / SSIM / ST-RRED.

Replacement for the reference's external ``dev_basics.utils.metrics``
(``compute_psnrs/compute_ssims/compute_strred``, test.py:25,245-252) and the CLI's
``psnr`` helper (blind_denoising.py:36-41).

All metrics accept video arrays shaped (..., T, H, W, C) or (T, H, W) numpy/JAX and
return per-frame numpy arrays, matching the reference convention of per-frame lists.
"""

from __future__ import annotations

import numpy as np


def _to_thwc(vid):
    vid = np.asarray(vid, dtype=np.float64)
    if vid.ndim == 2:  # (H,W)
        vid = vid[None, ..., None]
    elif vid.ndim == 3:  # (T,H,W)
        vid = vid[..., None]
    elif vid.ndim == 5:  # (B,T,H,W,C) -> flatten batch into time
        vid = vid.reshape((-1,) + vid.shape[2:])
    return vid


def psnr(img1, img2, peak=1.0):
    """Scalar PSNR over the full (squeezed) arrays, as blind_denoising.py:36-41."""
    x = (np.asarray(img1, dtype=np.float64).squeeze() - np.asarray(img2, dtype=np.float64).squeeze()).ravel()
    return 10.0 * np.log10(peak**2 / np.mean(x**2))


def compute_psnrs(deno, clean, div=255.0):
    """Per-frame PSNR. ``div`` rescales inputs to [0,1] first (dev_basics style)."""
    deno = _to_thwc(deno) / div
    clean = _to_thwc(clean) / div
    mse = np.mean((deno - clean) ** 2, axis=(1, 2, 3))
    with np.errstate(divide="ignore"):
        return 10.0 * np.log10(1.0 / mse)


def _gaussian_kernel1d(sigma, radius):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


def _filter2d_valid(img, k1d):
    """Separable 2D 'valid' convolution with a 1D kernel (gaussian window)."""
    from scipy.ndimage import convolve1d

    out = convolve1d(img, k1d, axis=0, mode="constant")
    out = convolve1d(out, k1d, axis=1, mode="constant")
    r = len(k1d) // 2
    return out[r:-r, r:-r] if r > 0 else out


def ssim_single(img1, img2, data_range=1.0, sigma=1.5, win_size=11):
    """SSIM of a single grayscale image pair (gaussian-weighted, standard constants)."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    r = win_size // 2
    kern = _gaussian_kernel1d(sigma, r)

    mu1 = _filter2d_valid(img1, kern)
    mu2 = _filter2d_valid(img2, kern)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d_valid(img1 * img1, kern) - mu1_sq
    s2 = _filter2d_valid(img2 * img2, kern) - mu2_sq
    s12 = _filter2d_valid(img1 * img2, kern) - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return float(np.mean(num / den))


def compute_ssims(deno, clean, div=255.0):
    """Per-frame SSIM (mean over channels)."""
    deno = _to_thwc(deno) / div
    clean = _to_thwc(clean) / div
    T, _, _, C = deno.shape
    out = np.zeros(T)
    for t in range(T):
        vals = [ssim_single(deno[t, ..., c], clean[t, ..., c]) for c in range(C)]
        out[t] = np.mean(vals)
    return out


# ---------------------------------------------------------------------------
# ST-RRED (reduced-reference spatio-temporal entropic differences)
#
# Implementation of Soundararajan & Bovik, "Video Quality Assessment by Reduced
# Reference Spatio-Temporal Entropic Differencing" (TCSVT 2013), following the
# single-subband simplification used by skvideo.measure.strred-style tooling:
# one wavelet-like band-pass subband per frame (spatial) and per frame-difference
# (temporal), GSM-modelled local entropies weighted by log(1 + variance).
# ---------------------------------------------------------------------------


def _bandpass(img):
    """Simple band-pass subband: difference-of-gaussians approximating a wavelet band."""
    from scipy.ndimage import gaussian_filter

    img = np.asarray(img, dtype=np.float64)
    return gaussian_filter(img, 1.0) - gaussian_filter(img, 2.0)


def _spatial_entropies(band, blk=3, sigma_nsq=0.1):
    """Local GSM entropies of a subband: h = log(2πe σ²_local) scaled weights."""
    from scipy.ndimage import uniform_filter

    mu = uniform_filter(band, blk)
    var = np.maximum(uniform_filter(band * band, blk) - mu * mu, 0.0)
    ent = 0.5 * np.log(2 * np.pi * np.e * (var + sigma_nsq))
    w = np.log(1.0 + var)
    return ent * w


def compute_strred(clean, deno, div=255.0):
    """Per-frame-pair ST-RRED values (lower is better; 0 for identical videos).

    Returns an array of length T-1 (or length 1 for single-frame videos, spatial
    only). The scalar reported by the reference harness is the mean.
    """
    ref = _to_thwc(clean) / div
    dis = _to_thwc(deno) / div
    # collapse channels to luma
    ref = ref.mean(-1)
    dis = dis.mean(-1)
    T = ref.shape[0]
    vals = []
    for t in range(max(T - 1, 1)):
        sref = _spatial_entropies(_bandpass(ref[t]))
        sdis = _spatial_entropies(_bandpass(dis[t]))
        srred = np.mean(np.abs(sref - sdis))
        if T > 1:
            tref = _spatial_entropies(_bandpass(ref[t + 1] - ref[t]))
            tdis = _spatial_entropies(_bandpass(dis[t + 1] - dis[t]))
            trred = np.mean(np.abs(tref - tdis))
        else:
            trred = 0.0
        vals.append(srred * trred if T > 1 else srred)
    return np.asarray(vals)
