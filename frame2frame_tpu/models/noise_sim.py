"""Learned noise simulator — a working stand-in for the reference's external
"stardeno" noise model (lib/frame2frame/lightning.py:102-109,151-155).

The reference loads a pretrained camera-noise generator by module name and
resamples ``batch['noisy']`` from ``batch['clean']`` each training step
(``sample_noisy``). The external model is not distributable here, so this
module provides a small *learned* heteroscedastic Gaussian simulator with the
same surface:

- ``load_sim(cfg)``     -> simulator object (the reference's ``load_noise_sim``)
- ``sim.run_rgb(clean, key)`` -> resampled noisy video, same shape as clean
- ``sim.fit(clean, noisy)``   -> MLE-fit of the noise model on real pairs

Model: sigma(x) = softplus(a + b * x) per channel — signal-dependent
(Poissonian-like) noise with two learnable parameters per channel, fit by
maximizing the Gaussian likelihood of observed residuals. Enough to exercise
the full sample_noisy path end-to-end and to sanity-fit real bursts; swap in
a heavier generator by pointing ``sim_module`` elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


class HeteroscedasticGaussianSim:
    """sigma(x) = softplus(a + b*x) per channel, pixel scale [0, 255]."""

    def __init__(self, channels=3, a=2.0, b=0.0):
        self.params = {
            "a": jnp.full((channels,), float(a), jnp.float32),
            "b": jnp.full((channels,), float(b), jnp.float32),
        }
        self.channels = channels

    def sigma(self, clean, params=None):
        p = self.params if params is None else params
        return _softplus(p["a"] + p["b"] * clean)

    def run_rgb(self, clean, key=None):
        """Resample noise onto ``clean`` ((..., C) in [0, 255])."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        clean = jnp.asarray(clean, jnp.float32)
        noise = jax.random.normal(key, clean.shape, clean.dtype)
        return clean + self.sigma(clean) * noise

    def fit(self, clean, noisy, steps=200, lr=0.05):
        """MLE fit on (clean, noisy) pairs: minimize
        mean(log sigma + r^2 / (2 sigma^2)), r = noisy - clean."""
        clean = jnp.asarray(clean, jnp.float32)
        r = jnp.asarray(noisy, jnp.float32) - clean

        def nll(params):
            s = self.sigma(clean, params) + 1e-3
            return jnp.mean(jnp.log(s) + 0.5 * (r / s) ** 2)

        import optax

        tx = optax.adam(lr)
        params = self.params
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(nll)(params)
            updates, state = tx.update(g, state)
            return optax.apply_updates(params, updates), state, loss

        loss = None
        for _ in range(steps):
            params, state, loss = step(params, state)
        self.params = params
        return float(loss)


def load_sim(cfg=None):
    """The reference's ``load_noise_sim`` entry point (lightning.py:107):
    build (and optionally fit) a simulator from a config."""
    from ..config import optional

    channels = optional(cfg, "sim_channels", 3) if cfg is not None else 3
    sim = HeteroscedasticGaussianSim(
        channels=channels,
        a=optional(cfg, "sim_sigma_a", 2.0) if cfg is not None else 2.0,
        b=optional(cfg, "sim_sigma_b", 0.0) if cfg is not None else 0.0,
    )
    return sim
