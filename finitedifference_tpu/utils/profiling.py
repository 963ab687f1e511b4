"""Device profiling (role of the reference's ad-hoc time.time()
instrumentation, SURVEY.md §5): structured traces via jax.profiler.

Usage:
    with trace("/tmp/fdtpu_trace"):
        run_something()
    # open in TensorBoard / xprof (profile plugin)
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step-rate meter (prints like the reference's
    per-timestep progress lines but with rates)."""

    def __init__(self, label: str = "step", every: int = 50):
        self.label = label
        self.every = every
        self.count = 0
        self.t0 = time.time()

    def tick(self):
        self.count += 1
        if self.count % self.every == 0:
            rate = self.count / (time.time() - self.t0)
            print(f"... {self.label} {self.count} ({rate:.2f}/s)")
