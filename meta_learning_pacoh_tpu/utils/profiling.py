"""Profiling/tracing helpers — first-class observability the reference lacks
(its only instrumentation is wall-clock deltas per log_period, SURVEY.md §5).

`trace(log_dir)` wraps a code block in a JAX profiler trace viewable in
TensorBoard/Perfetto; `StepTimer` collects steady-state steps/sec excluding
compile time.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace", create_perfetto_link=False):
    """Capture a JAX profiler trace (XLA ops, TPU timelines) for the block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates (steps, seconds) pairs; first call can be discarded as the
    compile warm-up via `skip_first`."""

    def __init__(self, skip_first=True):
        self.skip_first = skip_first
        self.records = []

    @contextlib.contextmanager
    def measure(self, n_steps):
        t0 = time.time()
        yield
        self.records.append((n_steps, time.time() - t0))

    @property
    def steps_per_sec(self):
        recs = self.records[1:] if (self.skip_first and len(self.records) > 1) \
            else self.records
        total_steps = sum(n for n, _ in recs)
        total_time = sum(t for _, t in recs)
        return total_steps / total_time if total_time > 0 else float("nan")

    def summary(self):
        return {
            "steps_per_sec": self.steps_per_sec,
            "n_measurements": len(self.records),
            "compile_overhead_sec": (
                self.records[0][1] - self.records[1][1]
                if len(self.records) > 1 and self.records[0][0] == self.records[1][0]
                else None
            ),
        }
