"""Device-memory metering (replacement for dev_basics.utils.gpu_mem, test.py:23,192).

On TPU, per-device live-buffer bytes come from ``device.memory_stats()``; values are
reported in GB to mirror the reference's ``(mem_res, mem_alloc)`` pairs.
"""

from __future__ import annotations


def device_mem_gb():
    """Return (reserved_gb, allocated_gb) for the first accelerator device."""
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        alloc = stats.get("bytes_in_use", 0) / 1e9
        peak = stats.get("peak_bytes_in_use", alloc * 1e9) / 1e9
        return peak, alloc
    except Exception:
        return 0.0, 0.0


def print_peak_gpu_stats(verbose, tag, reset=True):
    peak, alloc = device_mem_gb()
    if verbose:
        print(f"[{tag}] peak={peak:.3f}GB alloc={alloc:.3f}GB")
    return peak, alloc


class GpuMemer:
    """Named memory meter; items() yields (name, (mem_res, mem_alloc))."""

    def __init__(self):
        self.mems = {}

    def __setitem__(self, name, val):
        self.mems[name] = val

    def items(self):
        return self.mems.items()


class MemIt:
    """Context manager recording peak/alloc deltas for a stage (test.py:192)."""

    def __init__(self, memer, name):
        self.memer = memer
        self.name = name

    def __enter__(self):
        self._before = device_mem_gb()
        return self

    def __exit__(self, *exc):
        after = device_mem_gb()
        self.memer[self.name] = (after[0], after[1])
        return False
