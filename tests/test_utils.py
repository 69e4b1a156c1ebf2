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


def test_pad_bucket_geometric():
    from bjxa_tpu.ops.decode import pad_bucket

    # small counts: plain granularity rounding
    assert pad_bucket(20, 16) == 32
    assert pad_bucket(300) == 512
    assert pad_bucket(256) == 256
    # large counts: 4-bit mantissa, <= 1/8 waste, granularity-aligned
    for b in (5000, 99_000, 100_000, 1_000_000):
        p = pad_bucket(b)
        assert p >= b and p % 256 == 0
        assert p <= b * 1.25 + 256
    # nearby large lengths share one bucket (one compile)
    assert pad_bucket(99_000) == pad_bucket(100_000)
    # monotone
    prev = 0
    for b in range(1, 3000, 7):
        cur = pad_bucket(b)
        assert cur >= prev
        prev = cur


def test_counters_freeze():
    import time

    from bjxa_tpu.utils.profiler import Counters

    c = Counters()
    c.files = 3
    frozen = c.freeze().elapsed()
    time.sleep(0.02)
    assert c.elapsed() == frozen  # post-run work cannot inflate rates
    assert c.rates()["elapsed_s"] == frozen


def test_clear_compiled_caches_releases_and_recompiles():
    """The hygiene API empties the memoized shard_map wrappers and jax's
    executable caches, and everything still works (recompiles) after."""
    import jax
    import numpy as np

    from bjxa_tpu import clear_compiled_caches
    from bjxa_tpu.ops.decode import decode_batch_lanes
    from bjxa_tpu.parallel import sharded
    from bjxa_tpu.parallel.mesh import make_mesh
    from bjxa_tpu.ops.tables import block_size_for_bits

    rng = np.random.default_rng(7)
    bits = 6
    size = block_size_for_bits(bits)
    blocks = rng.integers(0, 256, size=(4, size, 2), dtype=np.uint8)
    blocks[:, 0, :] = 0  # profile 0/shift 0: always valid
    states = np.zeros((2, 2), np.int32)
    before = np.asarray(decode_batch_lanes(blocks, states, bits=bits)[0])

    # populate one memoized shard_map wrapper so the clear is observable
    mesh = make_mesh(jax.devices()[:1], dp=1, sp=1)
    sharded._corpus_lanes_fn(mesh, mesh.axis_names[0], bits)
    assert sharded._corpus_lanes_fn.cache_info().currsize == 1

    clear_compiled_caches()

    for cache in (
        sharded._corpus_lanes_fn,
        sharded._corpus_words_fn,
        sharded._corpus_encode_fn,
        sharded._file_sharded_fn,
        sharded._file_sharded_encode_fn,
    ):
        assert cache.cache_info().currsize == 0
    after = np.asarray(decode_batch_lanes(blocks, states, bits=bits)[0])
    np.testing.assert_array_equal(before, after)


def test_clear_compiled_caches_bounds_map_growth():
    """Regression guard for the round-5 SIGSEGV: repeated compile/clear
    cycles must not grow the process's mapping count monotonically
    (unbounded growth crossed vm.max_map_count and crashed inside XLA's
    executable deserializer — PERFORMANCE.md "Slow tier")."""
    import pathlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bjxa_tpu import clear_compiled_caches

    maps_path = pathlib.Path("/proc/self/maps")
    if not maps_path.exists():
        import pytest

        pytest.skip("needs /proc (Linux)")

    def n_maps():
        return len(maps_path.read_text().splitlines())

    def compile_batch(tag):
        # distinct shapes per cycle so every compile is fresh
        for i in range(4):
            n = 16 + 8 * i + tag
            f = jax.jit(lambda x: (x * 2 + 1).sum(axis=0))
            np.asarray(f(jnp.ones((n, n), jnp.int32)))

    compile_batch(0)  # warm lazily-initialized runtime state
    clear_compiled_caches()
    base = n_maps()
    for cycle in range(1, 4):
        compile_batch(100 * cycle)
        clear_compiled_caches()
    # freed executables + malloc_trim must return to ~baseline; the
    # margin absorbs allocator noise, not leaks (the bug grew by
    # hundreds of maps per compiled shape)
    assert n_maps() <= base + 200, (base, n_maps())
