"""Offline training loop — replacement for the external ``dev_basics.trte.
train.run`` + PyTorch-Lightning Trainer the reference launchers depend on
(scripts/trte_dncnn/train.py:20,39-45), with MetricsCallback-style accumulation
(lightning.py:554-601) and checkpoint/resume.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..config import Config, optional
from ..data import sets
from ..models import load_model
from ..models.serialization import save_variables
from .lit import TrainModule
from .schedules import make_optimizer
from .state import TrainState


class MetricsAccumulator:
    """Accumulates per-step/per-epoch metric dicts (MetricsCallback equivalent,
    lightning.py:554-601)."""

    def __init__(self):
        self.metrics = {}

    def append(self, m):
        for k, v in m.items():
            self.metrics.setdefault(k, []).append(v)

    def summary(self):
        return {k: (float(np.mean(v)) if np.ndim(v[0]) == 0 else v)
                for k, v in self.metrics.items()}


class CSVLogger:
    """Streams metric rows to a CSV file (lightning CSVLogger equivalent,
    lightning.py:63). Columns grow as new metric keys appear."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._keys = None
        self._rows = []

    def log(self, metrics):
        row = {k: v for k, v in metrics.items() if np.ndim(v) == 0}
        self._rows.append(row)
        keys = sorted({k for r in self._rows for k in r})
        if keys != self._keys:
            # column set changed: rewrite (rare — only when new metric keys
            # appear); otherwise append one line, O(1) per step
            self._keys = keys
            with open(self.path, "w") as f:
                f.write(",".join(self._keys) + "\n")
                for r in self._rows:
                    f.write(",".join(str(r.get(k, ""))
                                     for k in self._keys) + "\n")
            return
        with open(self.path, "a") as f:
            f.write(",".join(str(row.get(k, "")) for k in self._keys) + "\n")


def run(cfg):
    """Train a model per config; returns a results Config.

    Config keys: model (net_name/channels/...), data (dname/...), lit
    (crit_name/nepochs/lr_init/...), plus: checkpoint_dir, seed,
    limit_train_batches.
    """
    cfg = Config(cfg)
    seed = optional(cfg, "seed", 123)
    key = jax.random.PRNGKey(seed)

    ms = load_model(cfg)
    module = TrainModule(cfg, ms.model, residual=optional(cfg, "residual", True),
                         video_model=ms.get("video_model", False))
    nepochs = max(optional(cfg, "nepochs", 1), 1)

    data, loaders = sets.load(cfg)
    spe = max(len(data.tr), 1)
    tx, sched = make_optimizer(module.cfg, steps_per_epoch=spe)
    state = TrainState.create(ms.model, ms.variables, tx,
                              residual=optional(cfg, "residual", True))

    # data parallelism over all available devices: batch sharded, params
    # replicated; XLA SPMD inserts grad/BN reductions (sync-BN), so multi-
    # device steps match single-device math (reference analogue: DDP via
    # dev_basics.trte, lightning.py:435,532)
    mesh = None
    if optional(cfg, "data_parallel", True):
        from ..parallel.mesh import data_parallel_mesh, replicate_tree

        bs = optional(cfg, "batch_size", 1)
        mesh = data_parallel_mesh(bs)
        if mesh is not None:
            state = state.replace(
                params=replicate_tree(mesh, state.params),
                batch_stats=replicate_tree(mesh, state.batch_stats),
                opt_state=replicate_tree(mesh, state.opt_state),
            )

    ckpt_dir = Path(optional(cfg, "checkpoint_dir", "./output/checkpoints"))
    uuid = optional(cfg, "uuid", "default")
    limit = optional(cfg, "limit_train_batches", -1)

    acc = MetricsAccumulator()
    csv_logger = None
    if optional(cfg, "log_csv", True):
        csv_logger = CSVLogger(ckpt_dir / f"{uuid}-metrics.csv")
    for epoch in range(nepochs):
        for i, batch in enumerate(loaders.tr):
            if limit > 0 and i >= limit:
                break
            key, sub = jax.random.split(key)
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(mesh, batch)
            state, metrics = module.training_step(state, batch, epoch, sub)
            metrics["lr"] = float(sched(state.step - 1))
            metrics["epoch"] = epoch
            acc.append(metrics)
            if csv_logger is not None:
                csv_logger.log(metrics)

        # validation at epoch end (lightning val loop analogue)
        val = MetricsAccumulator()
        for batch in loaders.val:
            val.append(module.eval_step(state, batch, prefix="val"))
        acc.append(val.summary())

        save_variables(ckpt_dir / f"{uuid}-epoch{epoch:03d}.msgpack",
                       {"params": state.params, "batch_stats": state.batch_stats})

    save_variables(ckpt_dir / f"{uuid}-final.msgpack",
                   {"params": state.params, "batch_stats": state.batch_stats})

    out = Config(acc.summary())
    # summary() averages across epochs; also expose the LAST epoch's value
    # per metric — the one that describes the shipped (final) checkpoint
    out.final = Config({k: (float(v[-1]) if np.ndim(v[-1]) == 0 else v[-1])
                        for k, v in acc.metrics.items()})
    out.state = state
    out.checkpoint = str(ckpt_dir / f"{uuid}-final.msgpack")
    return out
