"""Misc helpers (replacement for dev_basics.utils.misc, reference test.py:21-22)."""

from __future__ import annotations

import pickle
import random
from pathlib import Path

import numpy as np


def set_seed(seed):
    """Seed host RNGs and return a jax PRNG key (reference test.py:37,90)."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)


def rslice(vid, region):
    """Slice a video by a (t0,t1,h0,h1,w0,w1) region tuple; None -> unchanged."""
    if region is None:
        return vid
    t0, t1, h0, h1, w0, w1 = region
    return vid[..., t0:t1, h0:h1, w0:w1, :] if vid.ndim >= 4 else vid


def get_region_gt(shape):
    """Central ground-truth region used by internal adaptation (test.py:198)."""
    t, h, w = shape[0], shape[-3], shape[-2]
    return [0, t, h // 4, 3 * h // 4, w // 4, 3 * w // 4]


def slice_flows(flows, tslice):
    """Slice fflow/bflow dicts along time."""
    if flows is None:
        return None
    return {k: v[:, tslice] for k, v in flows.items()}


def write_pickle(path, obj):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def read_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)
