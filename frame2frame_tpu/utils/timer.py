"""Stage timers (replacement for dev_basics.utils.timer, reference test.py:24,135)."""

from __future__ import annotations

import time


class ExpTimer:
    """Named wall-clock stage timer. ``timer_<name>`` keys mirror the reference's
    result columns (test.py:109-112)."""

    def __init__(self):
        self._start = {}
        self.times = {}

    def start(self, name):
        self._start[name] = time.perf_counter()

    def stop(self, name):
        dt = time.perf_counter() - self._start.pop(name)
        self.times[f"timer_{name}"] = self.times.get(f"timer_{name}", 0.0) + dt
        return dt

    def items(self):
        return self.times.items()

    def __getitem__(self, name):
        return self.times[name]

    def __contains__(self, name):
        return name in self.times


class TimeIt:
    """Context manager: ``with TimeIt(timer, "flow"): ...`` (reference test.py:157)."""

    def __init__(self, timer, name, sync=True):
        self.timer = timer
        self.name = name
        self.sync = sync

    def _block(self):
        if not self.sync:
            return
        try:  # make device work visible to wall-clock timing
            import jax

            jax.effects_barrier()
        except Exception:
            pass

    def __enter__(self):
        self.timer.start(self.name)
        return self

    def __exit__(self, *exc):
        self._block()
        self.timer.stop(self.name)
        return False
