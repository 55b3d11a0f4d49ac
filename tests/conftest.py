"""Test configuration: run everything on a virtual 8-device CPU mesh so sharding
tests exercise real multi-device semantics without TPU hardware.

NB: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the platform is
forced via jax.config here (before any device use)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
