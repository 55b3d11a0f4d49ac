"""Test-time / instance adaptation loops — the reference's ``WrapWarpedLoss``
(warped_loss.py:63-115) and ``WrapDnlsLoss`` (stnls_loss.py:108-178)
equivalents, returned by the loss registry (``get_loss_fxn``, the missing
``losses`` module used at scripts/instances_adapt.py:216-219).

Each wrapper runs a self-contained fine-tune loop: ``nepochs`` x sliding
temporal windows (5 frames for warped, 3 for stnls) x ``nbatch_sample`` random
crops, with flow computed on the fly and an Adam step per window. The
reference's BN-frozen-in-eval behavior (instances_adapt.py:200-206) maps to
``train_bn=False`` (the model applies in eval mode inside the loss while
gradients still flow through params).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..flow import api as flow_api
from .state import TrainState, apply_gradients, make_train_apply


class _WrapBase:
    nf = 5

    def __init__(self, loss_fxn, isize, nepochs, nbatch_sample,
                 use_flow=False, flow_method="tvl1", train_bn=False,
                 nsteps=0):
        self.loss_fxn = loss_fxn
        self.nepochs = nepochs
        self.nbatch_sample = nbatch_sample
        self.use_flow = use_flow
        self.flow_method = flow_method
        self.train_bn = train_bn
        # optimizer-step budget per epoch (the reference threads
        # internal_adapt_nsteps into run_internal_adapt, test.py:189-203);
        # 0 = unlimited (every sliding window)
        self.nsteps = nsteps
        if isinstance(isize, str):
            isize = [int(x) for x in isize.split("_")]
        self.isize = isize

    def _crops(self, noisy, clean, ti, rng):
        from ..data.crop import run_rand_crop

        B = self.nbatch_sample
        n_w = noisy[:, ti : ti + self.nf]
        c_w = clean[:, ti : ti + self.nf]
        ns, cs = [], []
        for _ in range(B):
            n_b, c_b = run_rand_crop([n_w, c_w], self.isize, rng)
            ns.append(n_b)
            cs.append(c_b)
        return np.concatenate(ns), np.concatenate(cs)

    def _loss(self, apply_fn, noisy_i, clean_i, flows_i, epoch, key):
        raise NotImplementedError

    def __call__(self, state: TrainState, noisy, clean, seed=0, sched=None):
        """Run the adaptation; noisy/clean: (B, T, H, W, C) in [0, 1].
        Returns (state, info) with info.lr / info.loss traces
        (warped_loss.py:80-83); ``sched`` is the optimizer's learning-rate
        schedule (make_optimizer's second return), stepped per optimizer
        update like the reference scheduler (instances_adapt.py:209-211)."""
        info = Config(lr=[], loss=[])
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        T = noisy.shape[1]
        for epoch in range(self.nepochs):
            nwin = max(T - self.nf + 1, 1)
            if self.nsteps > 0:
                nwin = min(nwin, self.nsteps)
            for ti in range(nwin):
                noisy_i, clean_i = self._crops(np.asarray(noisy),
                                               np.asarray(clean), ti, rng)
                noisy_i = jnp.asarray(noisy_i)
                clean_i = jnp.asarray(clean_i)
                key, sub = jax.random.split(key)

                def loss_fn(params):
                    captured = {}
                    apply_fn = make_train_apply(state, params, captured)
                    if not self.train_bn:
                        base = apply_fn

                        def apply_eval(x, train=False):
                            return base(x, train=False)

                        apply_fn = apply_eval
                    loss = self._loss(apply_fn, noisy_i, clean_i, epoch, sub)
                    return loss, captured.get("batch_stats", state.batch_stats)

                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = apply_gradients(state, grads,
                                        new_bs if self.train_bn else None)
                info.loss.append(float(loss))
                info.lr.append(float(sched(state.step - 1)) if sched is not None
                               else state.step)
        return state, info

    def _fwd_video(self, apply_fn, vid):
        B, T = vid.shape[:2]
        out = apply_fn(vid.reshape((B * T,) + vid.shape[2:]))
        return out.reshape(vid.shape[:2] + out.shape[1:])


class WrapWarpedLoss(_WrapBase):
    """5-frame-window warped-loss adaptation (warped_loss.py:63-115)."""

    nf = 5

    def _loss(self, apply_fn, noisy_i, clean_i, epoch, key):
        deno_i = self._fwd_video(apply_fn, noisy_i)
        flows_i = flow_api.run_flows(jax.lax.stop_gradient(deno_i),
                                     self.use_flow, ftype=self.flow_method)
        return self.loss_fxn.run_pairs(deno_i, noisy_i, flows_i, epoch)


class WrapDnlsLoss(_WrapBase):
    """3-frame-window stnls-loss adaptation (stnls_loss.py:108-178)."""

    nf = 3

    def _loss(self, apply_fn, noisy_i, clean_i, epoch, key):
        deno_i = self._fwd_video(apply_fn, noisy_i)
        flows_i = flow_api.run_flows(jax.lax.stop_gradient(deno_i),
                                     self.use_flow, ftype=self.flow_method)
        return self.loss_fxn(noisy_i, clean_i, deno_i, flows_i, epoch, key)


class WrapSupLoss(_WrapBase):
    """Supervised adaptation window loop ("sup" loss_type of instances_adapt)."""

    nf = 3

    def _loss(self, apply_fn, noisy_i, clean_i, epoch, key):
        deno_i = self._fwd_video(apply_fn, noisy_i)
        return jnp.mean((deno_i - clean_i) ** 2)
