"""Observability and progress utilities."""

from bjxa_tpu.utils.profiler import Profiler, Counters
from bjxa_tpu.utils.progress import Manifest

__all__ = ["Profiler", "Counters", "Manifest"]
