"""Wall-clock stage timing (reference: libs/utils/timer.py Timer, the
py-faster-rcnn tic/toc heritage; SURVEY.md §5.1). For honest device timing
call ``jax.block_until_ready`` on step outputs before ``toc`` — and note
that on relayed/remote TPU transports block_until_ready may ack early; the
benchmark methodology in bench.py (chained on-device loop) is authoritative
for throughput numbers."""

from __future__ import annotations

import time
from collections import defaultdict


class Timer:
    def __init__(self):
        self.total = defaultdict(float)
        self.calls = defaultdict(int)
        self._start = {}

    def tic(self, name: str = "default"):
        self._start[name] = time.perf_counter()

    def toc(self, name: str = "default") -> float:
        dt = time.perf_counter() - self._start[name]
        self.total[name] += dt
        self.calls[name] += 1
        return dt

    def average(self, name: str = "default") -> float:
        return self.total[name] / max(self.calls[name], 1)

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {self.average(k) * 1000:.1f}ms" for k in sorted(self.total)
        )
