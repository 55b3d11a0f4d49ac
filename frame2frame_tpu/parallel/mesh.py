"""Device-mesh helpers for multi-chip execution.

The reference has no model/data parallelism beyond a 1-GPU DataParallel wrapper
(SURVEY.md §2.4; blind_denoising.py:145-146). The TPU framework makes scale
first-class: a 2D ``(data, time)`` mesh shards video batches over data-parallel
replicas and long sequences over the temporal axis (the context-parallel
analogue for video), with gradient psum over both axes and frame-halo exchange
via ``ppermute`` for temporally-coupled losses.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_time=1, devices=None):
    """Build a (data, time) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_time
    assert n_data * n_time <= n, (n_data, n_time, n)
    devs = np.asarray(devices[: n_data * n_time]).reshape(n_data, n_time)
    return Mesh(devs, axis_names=("data", "time"))


def video_sharding(mesh):
    """Sharding for (B, T, H, W, C) videos: batch over data, frames over time."""
    return NamedSharding(mesh, P("data", "time"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_video(mesh, vid):
    return jax.device_put(vid, video_sharding(mesh))


def data_parallel_mesh(batch_size, devices=None):
    """Largest usable (data,)-only mesh for a given batch size, or None.

    Used by the offline trainer (train/trainer.py) to shard batches over all
    devices: with the batch axis sharded and parameters replicated, XLA's
    SPMD partitioner inserts the gradient/BN-stat reductions automatically,
    so the step is numerically the single-device step (sync-BN semantics) —
    the TPU-native replacement for the reference's DDP launch
    (lightning.py:435,532 via dev_basics.trte)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n < 2 or batch_size < 2:
        return None
    n_data = max(d for d in range(1, min(n, batch_size) + 1)
                 if batch_size % d == 0)
    if n_data < 2:
        return None
    return make_mesh(n_data=n_data, n_time=1, devices=devices[:n_data])


def shard_batch(mesh, batch):
    """Shard a Config/dict of (B, ...) arrays over the data axis; scalars and
    non-divisible arrays pass through replicated."""
    n_data = mesh.shape["data"]
    spec = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in dict(batch).items():
        try:
            arr = np.asarray(v) if not hasattr(v, "shape") else v
        except ValueError:  # ragged list field (e.g. per-sample names)
            out[k] = v
            continue
        if (getattr(arr, "ndim", 0) >= 1 and arr.shape[0] % n_data == 0
                and arr.dtype.kind in "biufc"):
            out[k] = jax.device_put(jax.numpy.asarray(arr), spec)
        else:
            out[k] = v
    return out


def replicate_tree(mesh, tree):
    """Replicate a pytree (params/opt state) over the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep)
                        if hasattr(x, "shape") else x, tree)
