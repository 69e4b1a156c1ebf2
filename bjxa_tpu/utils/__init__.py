"""Observability, progress, and process-hygiene utilities."""

from bjxa_tpu.utils.profiler import Profiler, Counters
from bjxa_tpu.utils.progress import Manifest
from bjxa_tpu.utils.hygiene import clear_compiled_caches

__all__ = ["Profiler", "Counters", "Manifest", "clear_compiled_caches"]
