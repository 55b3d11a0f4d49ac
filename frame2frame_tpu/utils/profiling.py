"""On-device tracing and memory profiling — the TPU-native counterpart of the
reference's wall-clock stage timers and GPU memory meters (SURVEY §5;
reference test.py:24,135,157 timers, test.py:23,192 GpuMemer/MemIt,
lightning.py:451-454 print_peak_gpu_stats).

Wall-clock timers live in utils/timer.py and mirror the reference's
``timer_*`` result columns; this module adds what only the XLA runtime can
provide: hardware trace capture (``jax.profiler`` — op-level device
timelines viewable in TensorBoard/Perfetto) and device memory profiles.

Usage:
    with trace_if("/tmp/trace"):          # no-op when path is None/empty
        step(...)
    write_memory_profile("mem.prof")       # pprof-format HBM snapshot
    annotate("flow"):                      # named region in the trace
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace_if(trace_dir, create_perfetto_link=False):
    """jax.profiler.trace context when ``trace_dir`` is truthy, else no-op.

    The captured trace includes device-side op timelines (the data behind the
    per-op accounting in BASELINE.md) and loads in TensorBoard's profile
    plugin or ui.perfetto.dev.
    """
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir,
                            create_perfetto_link=create_perfetto_link):
        yield


def annotate(name):
    """Named sub-region inside an active trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def write_memory_profile(path):
    """Write a pprof-format device memory profile (live HBM allocations) —
    the counterpart of the reference's peak-GPU-stats printout."""
    import jax

    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
    return path


def peak_device_memory_mb():
    """Best-effort peak/live HBM usage in MB per device (memory_stats is not
    implemented by every backend — returns {} then)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        if stats:
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_in_use_mb":
                    stats.get("peak_bytes_in_use", 0) / 2**20,
            }
    return out
