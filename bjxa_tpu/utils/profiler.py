"""Profiling hooks: jax.profiler traces + throughput counters.

The reference has no instrumentation at all (SURVEY §5); here the corpus
engine reports samples/sec and files/sec, and can capture a device trace
for xprof when asked.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class Counters:
    """Monotonic throughput counters."""

    files: int = 0
    blocks: int = 0
    samples: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    started_at: float = dataclasses.field(default_factory=time.perf_counter)
    frozen_s: float | None = None

    def freeze(self) -> "Counters":
        """Stop the clock: rates computed later report the span up to now.

        The corpus engine freezes its counters when conversion finishes so
        post-run work (cross-host collectives that block on the slowest
        sibling, host-side printing) cannot inflate the reported elapsed.
        """
        self.frozen_s = self.elapsed()
        return self

    def elapsed(self) -> float:
        if self.frozen_s is not None:
            return self.frozen_s
        return max(time.perf_counter() - self.started_at, 1e-9)

    def rates(self) -> dict:
        dt = self.elapsed()
        return {
            "files_per_s": self.files / dt,
            "msamples_per_s": self.samples / dt / 1e6,
            "mb_in_per_s": self.bytes_in / dt / 1e6,
            "mb_out_per_s": self.bytes_out / dt / 1e6,
            "elapsed_s": dt,
        }


class Profiler:
    """Optional jax.profiler trace around a region of work."""

    def __init__(self, trace_dir: str | None = None):
        self.trace_dir = trace_dir
        self.counters = Counters()

    @contextlib.contextmanager
    def trace(self):
        if self.trace_dir:
            import jax

            with jax.profiler.trace(self.trace_dir):
                yield self
        else:
            yield self

    @contextlib.contextmanager
    def annotate(self, name: str):
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
