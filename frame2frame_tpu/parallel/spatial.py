"""Spatial (single-frame) sharding: split H across a ``space`` mesh axis.

The third scaling axis next to data/time parallelism (parallel/shard.py):
one LARGE frame (1080p/4K/8K) is partitioned row-wise across chips and the
whole online fine-tune step — conv stacks, warp, occlusion masking, loss,
Adam — runs under ``jax.jit`` with input shardings, letting **XLA's SPMD
partitioner** insert the halo exchanges for the 3x3 convolutions and the
global reductions for BatchNorm statistics and the loss automatically.

Two engines serve this axis:

- **XLA path** (conv_impl="packed"/...): the partitioner owns all
  communication — numerically identical to the unsharded program (BN stats
  and loss sums are global), any partitionable model shards without kernel
  changes.
- **Fused Pallas path** (conv_impl="fused"): custom kernels are opaque to
  SPMD, so the production engine gets its communication written by hand in
  ``ops/fused_spatial.py`` — shard_map with per-layer ``ppermute`` halo
  tiles and ``psum``'d BN statistics/gradients, exact single-chip
  semantics on the 2x-faster engine.

The reference has no model/spatial parallelism at all (SURVEY.md §2.4);
its closest analogue is host-side overlap-tiled spatial chunking
(net_chunks, test.py:172-175), which approximates boundaries. This is the
TPU-native exact version.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_space_mesh(n_space=None, devices=None):
    """1-D mesh over a ``space`` axis (all local devices by default)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    if n_space is None:
        n_space = len(devices)
    return Mesh(np.asarray(devices[:n_space]).reshape(n_space), ("space",))


def frame_sharding(mesh):
    """(H, W, C) frame partitioned along H."""
    return NamedSharding(mesh, P("space", None, None))


def make_spatial_online_step(model, tx, mesh, iters=20, residual_model=False):
    """H-sharded online fine-tune step (the blind_denoising hot loop,
    blind_denoising.py:216-222, for frames too large for one chip).

    Returns ``step(params, batch_stats, opt_state, cur, prev, flow)`` with
    the same signature/semantics as ``train.online.make_online_step`` —
    frame operands are placed with ``frame_sharding(mesh)``, everything else
    replicated; jit propagates the shardings through the 20-iteration scan.

    Engine selection follows ``model.conv_impl``: ``"fused"`` runs the
    shard_map'd fused Pallas pipeline (ops/fused_spatial.py — manual
    ppermute halos + psum'd sync-BN statistics); any XLA conv path is
    H-split by the SPMD partitioner, which inserts the halos itself.
    """
    from ..train.online import make_online_step

    spatial_mesh = mesh if getattr(model, "conv_impl", None) == "fused" \
        else None
    base = make_online_step(model, tx, iters=iters,
                            residual_model=residual_model, unroll=False,
                            spatial_mesh=spatial_mesh)
    fsh = frame_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def step(params, batch_stats, opt_state, cur, prev, flow):
        params = jax.device_put(params, rep)
        batch_stats = jax.device_put(batch_stats, rep)
        opt_state = jax.device_put(opt_state, rep)
        cur = jax.device_put(jnp.asarray(cur), fsh)
        prev = jax.device_put(jnp.asarray(prev), fsh)
        flow = jax.device_put(jnp.asarray(flow),
                              NamedSharding(mesh, P("space", None, None)))
        return base(params, batch_stats, opt_state, cur, prev, flow)

    return step
