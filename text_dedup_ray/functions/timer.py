"""Per-stage wall-clock timing with a percentage report.

Reference parity: ``utils/timer.py:16-76`` (``Timer``/``TimerContext`` — each
pipeline stage is timed and ``report()`` prints elapsed seconds and the share
of total). Here the pipelines populate a Timer around their synchronization
points (materialize barriers, CC, consuming passes); bench.py and the
benchmark harness print the report, and the flagship exposes it in
``MinHashDedupResult.metrics['stage_seconds']``.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self) -> None:
        self.stages: dict[str, float] = {}  # insertion-ordered

    @contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (time.perf_counter() - t0)

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def report(self, ndigits: int = 3) -> dict[str, float]:
        return {k: round(v, ndigits) for k, v in self.stages.items()}

    def report_str(self) -> str:
        """Human report like the reference's Timer.report (utils/timer.py:55-76)."""
        total = self.total or 1.0
        lines = [
            f"{name:<28s} {secs:8.3f}s {100.0 * secs / total:5.1f}%"
            for name, secs in self.stages.items()
        ]
        lines.append(f"{'total':<28s} {self.total:8.3f}s")
        return "\n".join(lines)
