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
