"""Utility-layer tests: restart manifest durability, throughput counters."""

import json

from bjxa_tpu.utils.progress import Manifest
from bjxa_tpu.utils.profiler import Counters, Profiler


def test_manifest_roundtrip(tmp_path):
    p = tmp_path / "m.jsonl"
    m = Manifest(p)
    assert len(m) == 0 and not m.is_done("a")
    m.record("a", out="x.wav")
    m.record("b", out="y.wav", samples=42)
    m2 = Manifest(p)
    assert len(m2) == 2
    assert m2.is_done("a") and m2.is_done("b")


def test_manifest_torn_tail(tmp_path):
    """A crash mid-append must not poison the next run."""
    p = tmp_path / "m.jsonl"
    m = Manifest(p)
    m.record("done", out="x.wav")
    with p.open("a") as f:
        f.write('{"key": "torn-entr')  # simulated torn write
    m2 = Manifest(p)
    assert m2.is_done("done")
    assert not m2.is_done("torn-entr")
    m2.record("after", out="z.wav")
    assert Manifest(p).is_done("after")


def test_counters_rates():
    c = Counters()
    c.files += 3
    c.samples += 3_000_000
    r = c.rates()
    assert r["files_per_s"] > 0
    assert r["msamples_per_s"] > 0


def test_profiler_annotation_noop():
    prof = Profiler(trace_dir=None)
    with prof.trace():
        with prof.annotate("region"):
            pass
