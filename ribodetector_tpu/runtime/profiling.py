"""Per-stage wall-time counters + optional XLA profiler traces.

The reference has no tracing at all (SURVEY.md 5: only tqdm progress bars).
Here every run can report where time went (parse / encode / device dispatch /
device wait / write) via --profile, and --trace-dir captures a jax.profiler
trace viewable in TensorBoard/Perfetto.
"""

import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimer:
    """Accumulates wall time and invocation counts per named stage."""

    def __init__(self, enabled=True):
        self.enabled = enabled
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = time.time()

    @contextmanager
    def stage(self, name):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name, seconds, n=1):
        if self.enabled:
            self.totals[name] += seconds
            self.counts[name] += n

    def summary(self):
        wall = time.time() - self._t0
        lines = [f"stage timings (total wall {wall:.2f}s):"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            lines.append(
                f"  {name:<16} {t:8.2f}s  {100 * t / wall:5.1f}%  x{self.counts[name]}"
            )
        return "\n".join(lines)


@contextmanager
def maybe_trace(trace_dir):
    """jax.profiler trace context when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
