"""Tracing / profiling hooks (SURVEY.md section 5: absent in the reference;
here: jax.profiler wrappers emitting xplane traces for xprof/tensorboard)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture a device trace: `with trace("/tmp/anemoi_trace"): run()`."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock section timing with forced device sync."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        self.sections[name] = self.sections.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"{k}: {v*1e3:.2f} ms ({v/total:.0%})" for k, v in self.sections.items()]
        return "\n".join(lines)
