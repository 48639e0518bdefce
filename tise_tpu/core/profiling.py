"""Tracing & throughput observability.

The reference has no profiling beyond tqdm counters (SURVEY.md section 5.1);
this module adds the TPU-native equivalents: ``jax.profiler`` trace capture
around any pipeline section (viewable in TensorBoard/Perfetto) and a
throughput meter that the extractors report images/sec through — the
BASELINE.json north-star unit.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed section."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Streaming images/sec counter with periodic logging."""

    name: str = "extract"
    log_every: int = 50
    _count: int = 0
    _batches: int = 0
    _start: Optional[float] = None

    def update(self, n: int) -> None:
        if self._start is None:
            self._start = time.perf_counter()
        self._count += n
        self._batches += 1
        if self.log_every and self._batches % self.log_every == 0:
            print(f"[{self.name}] {self.rate():.1f} images/sec ({self._count} done)", flush=True)

    def rate(self) -> float:
        if not self._start:
            return 0.0
        dt = time.perf_counter() - self._start
        return self._count / dt if dt > 0 else 0.0

    def summary(self) -> str:
        return json.dumps({"name": self.name, "images": self._count, "images_per_sec": round(self.rate(), 2)})
