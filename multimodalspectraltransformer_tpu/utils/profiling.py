"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference attaches PL's SimpleProfiler to every Trainer
(`MT_functions_v15_4.py:115,139`) and sprinkles ad-hoc ``time.time()``
spans (`sgnn_code_pl_v15_4.py:829,864`). TPU-native equivalents:

- ``device_trace``: a jax.profiler trace context producing XProf/
  TensorBoard-compatible artifacts for real device timelines,
- ``PhaseTimer``: wall-clock phase spans with a SimpleProfiler-style
  summary report (host-side stages: chemistry, IO, filters),
- ``annotate``: named trace regions visible inside the device profile.

Note: under the remote axon backend `jax.block_until_ready` does not block,
so phase timers around device work should force a host fetch of one output
(np.asarray) to measure real execution rather than dispatch.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating wall-clock spans per phase name.

    >>> t = PhaseTimer()
    >>> with t.phase("encode"): ...
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        """SimpleProfiler-style table sorted by total time."""
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        width = max((len(n) for n, _ in rows), default=5)
        lines = [f"{'phase'.ljust(width)}  {'total_s':>9}  {'calls':>6}  {'mean_ms':>9}"]
        for name, total in rows:
            n = self.counts[name]
            lines.append(
                f"{name.ljust(width)}  {total:9.3f}  {n:6d}  {total / n * 1000:9.2f}"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name]}
            for name in self.totals
        }
