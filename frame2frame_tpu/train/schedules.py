"""Learning-rate schedules matching the reference's scheduler zoo
(lightning.py:186-227): exp_decay (default), step, cosa, cosa_step,
multi_step, coswr, none.

All return an optax schedule ``f(step) -> lr``. Epoch-interval schedulers
(exp_decay / step / cosa / multi_step) are expressed per-step via
``steps_per_epoch`` so the whole optimizer stays jittable.
"""

from __future__ import annotations

import math

import optax

from ..config import optional


def make_schedule(cfg, steps_per_epoch=1):
    name = optional(cfg, "scheduler_name", "default")
    lr_init = optional(cfg, "lr_init", 1e-3)
    lr_final = optional(cfg, "lr_final", 1e-8)
    nepochs = max(optional(cfg, "nepochs", 0), 1)
    nsteps = optional(cfg, "nsteps", 0)
    spe = max(int(steps_per_epoch), 1)

    if name in ("default", "exp_decay"):
        # gamma chosen so lr_init -> lr_final over nepochs (lightning.py:187-191)
        gamma = math.exp(math.log(lr_final / lr_init) / nepochs)
        return optax.exponential_decay(lr_init, transition_steps=spe,
                                       decay_rate=gamma, staircase=True)
    if name in ("step", "steplr"):
        size = optional(cfg, "step_lr_size", 5)
        gamma = optional(cfg, "step_lr_gamma", 0.1)
        return optax.exponential_decay(lr_init, transition_steps=size * spe,
                                       decay_rate=gamma, staircase=True)
    if name == "cosa":
        return optax.cosine_decay_schedule(lr_init, nepochs * spe)
    if name == "cosa_step":
        n = nsteps if nsteps > 0 else nepochs * spe
        return optax.cosine_decay_schedule(lr_init, n, alpha=lr_final / lr_init)
    if name == "multi_step":
        gamma = optional(cfg, "step_lr_gamma", 0.1)
        milestones = [int(x) for x in
                      str(optional(cfg, "step_lr_multisteps", "30-50")).split("-")]
        bounds = {m * spe: gamma for m in milestones}
        return optax.piecewise_constant_schedule(lr_init, bounds)
    if name == "coswr":
        T0 = optional(cfg, "coswr_T0", 1)
        Tmult = optional(cfg, "coswr_Tmult", 1)
        eta_min = optional(cfg, "coswr_eta_min", 1e-9)
        periods = []
        t = max(T0, 1)
        total = nsteps if nsteps > 0 else nepochs * spe
        acc = 0
        while acc < total and len(periods) < 64:
            periods.append(t)
            acc += t
            t *= max(Tmult, 1)
        return optax.sgdr_schedule(
            [dict(init_value=lr_init, peak_value=lr_init, end_value=eta_min,
                  decay_steps=p, warmup_steps=0) for p in periods]
        )
    if name == "none":
        return optax.constant_schedule(lr_init)
    raise ValueError(f"Unknown scheduler [{name}]")


def scale_by_torch_sgd_momentum(momentum, dampening=0.0):
    """torch.optim.SGD momentum semantics: buf_0 = g_0 (undampened first
    step), buf_t = momentum*buf + (1 - dampening)*g afterwards. optax.trace
    has no dampening and optax has no equivalent of the first-step special
    case."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"count": jnp.zeros([], jnp.int32),
                "buf": jax.tree.map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        first = state["count"] == 0

        def merge(g, b):
            return jnp.where(first, g, momentum * b + (1.0 - dampening) * g)

        buf = jax.tree.map(merge, updates, state["buf"])
        return buf, {"count": state["count"] + 1, "buf": buf}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, steps_per_epoch=1):
    """Optimizer factory matching configure_optimizers (lightning.py:169-181):
    adam or sgd with the torch weight-decay-in-gradient convention."""
    name = optional(cfg, "optim_name", "adam")
    wd = optional(cfg, "weight_decay", 0.0)
    sched = make_schedule(cfg, steps_per_epoch)
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    if name == "adam":
        parts.append(optax.scale_by_adam())
    elif name == "sgd":
        momentum = optional(cfg, "sgd_momentum", 0.1)
        dampening = optional(cfg, "sgd_dampening", 0.1)
        parts.append(scale_by_torch_sgd_momentum(momentum, dampening))
    else:
        raise ValueError(f"Unknown optim [{name}]")
    parts.append(optax.scale_by_schedule(lambda s: -sched(s)))
    return optax.chain(*parts), sched
