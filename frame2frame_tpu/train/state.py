"""Functional training state: params + batch stats + optimizer, the JAX
counterpart of the reference's (model, optim, scheduler) triple that
``get_loss_fxn`` wrappers receive (instances_adapt.py:216-219)."""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclass
class TrainState:
    apply_fn: Callable  # model.apply
    params: Any
    batch_stats: Any
    tx: optax.GradientTransformation
    opt_state: Any
    residual: bool = True  # model returns denoised image directly
    step: int = 0

    def replace(self, **kw):
        return replace(self, **kw)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def eval_apply(self, x, **kw):
        out = self.apply_fn(self.variables, x, train=False, **kw)
        return out if self.residual else x - out

    @classmethod
    def create(cls, model, variables, tx, residual=True):
        params = variables["params"]
        return cls(
            apply_fn=model.apply,
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            tx=tx,
            opt_state=tx.init(params),
            residual=residual,
        )


def make_train_apply(state: TrainState, params, captured: dict):
    """Build an ``apply_fn(x) -> deno`` closure over traced ``params`` that
    records BatchNorm stat updates into ``captured`` (the last call wins,
    matching torch's sequential running-stat updates closely enough for the
    multi-forward losses)."""

    def apply_fn(x, train=True):
        if train:
            out, upd = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            captured["batch_stats"] = upd["batch_stats"]
        else:
            out = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=False,
            )
        return out if state.residual else x - out

    return apply_fn


def apply_gradients(state: TrainState, grads, new_batch_stats=None):
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=new_batch_stats if new_batch_stats is not None else state.batch_stats,
        step=state.step + 1,
    )
