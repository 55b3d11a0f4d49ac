"""Persistent XLA compilation cache setup.

The fused Pallas training pipeline (ops/fused_stack.py) takes minutes to
compile at 540p (30 Mosaic kernel instances inside a scanned While body);
the persistent cache brings warm process start-up down to seconds. Opt-out
with F2F_NO_COMPILE_CACHE=1. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(path=None):
    global _DONE
    if _DONE or os.environ.get("F2F_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = path or os.environ.get(
        "F2F_COMPILE_CACHE", os.path.expanduser("~/.cache/f2f_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _DONE = True
    except Exception:
        pass
