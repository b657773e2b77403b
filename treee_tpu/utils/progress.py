"""Progress reporting.

The reference polls AtomicUsize counters from the egui progress bar each frame
(loading.rs:25,111; segmenting.rs:104-105; calculations.rs:127-130).  Our
phases are single fused device programs, so progress is naturally per dispatch
unit (ingest chunks, bench iterations, frame sweeps): a thread-safe counter
plus an optional callback/console sink.
"""

from __future__ import annotations

import sys
import threading
import time


class Progress:
    """Thread-safe counter with optional throttled console rendering."""

    def __init__(self, total: int, label: str = "", echo: bool = False,
                 min_interval: float = 0.25):
        self.total = max(total, 1)
        self.label = label
        self.echo = echo
        self._n = 0
        self._lock = threading.Lock()
        self._last = 0.0
        self._min_interval = min_interval

    def add(self, k: int = 1) -> None:
        with self._lock:
            self._n += k
            n = self._n
        if self.echo:
            now = time.monotonic()
            if now - self._last >= self._min_interval or n >= self.total:
                self._last = now
                frac = n / self.total
                bar = "#" * int(frac * 30)
                sys.stderr.write(f"\r{self.label} [{bar:<30}] {frac:6.1%}")
                if n >= self.total:
                    sys.stderr.write("\n")
                sys.stderr.flush()

    @property
    def fraction(self) -> float:
        with self._lock:
            return self._n / self.total

    def done(self) -> bool:
        with self._lock:
            return self._n >= self.total
