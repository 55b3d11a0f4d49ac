"""Noise synthesis transforms.

Replacement for the reference's external ``data_hub.transforms.noise.
choose_noise_transform`` (lightning.py:125-126) with the harness's noise-type
keys (lightning.py:86,357-366): ``ntype`` in {"g", "pg", "msg"} with
``sigma`` / ``rate`` / ``sigma_min`` / ``sigma_max``.

All transforms are pure functions of a JAX PRNG key operating on [0, 255]-scale
videos (the harness divides by 255 afterwards, lightning.py:293-294), so noise
sampling jits/vmaps and can fuse into the training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import optional


class GaussianNoise:
    """AWGN with fixed sigma (in [0,255] scale)."""

    def __init__(self, sigma):
        self.sigma = float(sigma)
        self.ntype = "g"

    def __call__(self, key, clean):
        return clean + self.sigma * jax.random.normal(key, clean.shape, clean.dtype)


class PoissonGaussianNoise:
    """Poisson shot noise at ``rate`` photons/pixel plus AWGN sigma."""

    def __init__(self, rate, sigma=0.0):
        self.rate = float(rate)
        self.sigma = float(sigma)
        self.ntype = "pg"

    def __call__(self, key, clean):
        kp, kg = jax.random.split(key)
        lam = jnp.clip(clean / 255.0, 0.0, 1.0) * self.rate
        shot = jax.random.poisson(kp, lam).astype(clean.dtype) / self.rate * 255.0
        return shot + self.sigma * jax.random.normal(kg, clean.shape, clean.dtype)


class MultiScaleGaussianNoise:
    """AWGN with per-sample sigma drawn uniformly from [sigma_min, sigma_max].

    The drawn sigma is returned alongside the noisy video so sigma-map channels
    (``dd_in=4``, lightning.py:129-141) can be built.
    """

    def __init__(self, sigma_min, sigma_max):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.ntype = "msg"
        self.sigma = 0.5 * (self.sigma_min + self.sigma_max)

    def __call__(self, key, clean, return_sigma=False):
        ks, kn = jax.random.split(key)
        # one sigma per leading batch element
        bshape = clean.shape[:1] if clean.ndim >= 4 else ()
        sigma = jax.random.uniform(ks, bshape, clean.dtype,
                                   self.sigma_min, self.sigma_max)
        sig = sigma.reshape(bshape + (1,) * (clean.ndim - len(bshape)))
        noisy = clean + sig * jax.random.normal(kn, clean.shape, clean.dtype)
        if return_sigma:
            return noisy, sigma
        return noisy


def choose_noise_transform(cfg):
    """Dispatch on cfg.ntype (g / pg / msg), mirroring the reference keys."""
    ntype = optional(cfg, "ntype", "g")
    if ntype == "g":
        return GaussianNoise(optional(cfg, "sigma", 25.0))
    if ntype == "pg":
        return PoissonGaussianNoise(optional(cfg, "rate", 10.0),
                                    optional(cfg, "sigma", 0.0))
    if ntype == "msg":
        return MultiScaleGaussianNoise(optional(cfg, "sigma_min", 5.0),
                                       optional(cfg, "sigma_max", 50.0))
    raise ValueError(f"Unknown noise type [{ntype}]")


def add_jpeg_artifacts(clean, quality=30):
    """JPEG compression artifacts (host-side, BASELINE.json config 3 noise sweep).

    clean: (T, H, W) or (T, H, W, C) uint8-range array. Returns same shape float32.
    """
    import io as _io

    import numpy as np
    from PIL import Image

    clean = np.asarray(clean)
    out = np.empty_like(clean, dtype=np.float32)
    for t in range(clean.shape[0]):
        frame = np.clip(clean[t], 0, 255).astype(np.uint8)
        img = Image.fromarray(frame)
        buf = _io.BytesIO()
        img.save(buf, format="JPEG", quality=quality)
        buf.seek(0)
        out[t] = np.asarray(Image.open(buf), dtype=np.float32)
    return out


def anscombe(x):
    """Anscombe variance-stabilizing transform f(x) = 2*sqrt(x + 3/8)
    (the reference's disabled stubs, instances_adapt.py:79-89). Input in
    photon-count-like units (non-negative)."""
    import numpy as np

    return 2.0 * np.sqrt(np.maximum(np.asarray(x, np.float64), 0.0) + 0.375)


def anscombe_inverse(y):
    """Unbiased closed-form approximation of the exact inverse Anscombe
    transform (Makitalo & Foi 2011)."""
    import numpy as np

    y = np.asarray(y, np.float64)
    return (0.25 * y**2 + 0.25 * np.sqrt(1.5) / np.maximum(y, 1e-8)
            - 11.0 / 8.0 / np.maximum(y**2, 1e-8)
            + 0.625 * np.sqrt(1.5) / np.maximum(y**3, 1e-8) - 0.125)
