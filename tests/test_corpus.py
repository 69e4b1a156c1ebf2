"""Corpus engine tests: batched decode of a synthetic corpus, manifest
resume, per-file failure isolation, and multi-host sharding of the file
list."""

import numpy as np
import pytest

from bjxa_tpu.api import encode_pcm, xa_to_wav
from bjxa_tpu.parallel.corpus import decode_corpus


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(1)
    src = tmp_path / "src"
    src.mkdir()
    expect = {}
    spec = [
        (4, 1, 100),
        (6, 2, 321),
        (6, 2, 33),
        (8, 1, 64 * 32),
        (8, 2, 257),
        (6, 1, 1000),
    ]
    for i, (bits, channels, samples) in enumerate(spec):
        sig = rng.integers(-20000, 20000, size=(samples, channels)).astype(
            np.int16
        )
        xa = encode_pcm(sig, 44100, bits, search=True)
        p = src / f"file{i}.xa"
        p.write_bytes(xa)
        expect[p.stem] = xa_to_wav(xa)
    return src, expect


def test_corpus_decode(tmp_path, corpus):
    src, expect = corpus
    out = tmp_path / "out"
    res = decode_corpus(src, out, batch_files=3, bucket_granularity=16)
    assert res.converted == len(expect)
    assert not res.failed
    for stem, wav in expect.items():
        assert (out / f"{stem}.wav").read_bytes() == wav
    assert res.counters.files == len(expect)


def test_corpus_resume(tmp_path, corpus):
    src, expect = corpus
    out = tmp_path / "out"
    res1 = decode_corpus(src, out, bucket_granularity=16)
    assert res1.converted == len(expect)
    res2 = decode_corpus(src, out, bucket_granularity=16)
    assert res2.converted == 0
    assert res2.skipped == len(expect)


def test_corpus_bad_file_isolated(tmp_path, corpus):
    src, expect = corpus
    (src / "broken.xa").write_bytes(b"KWD2" + bytes(60))
    good = next(iter(expect))
    data = bytearray((src / f"{good}.xa").read_bytes())
    data[32] = 0xFF  # invalid profile in first block
    (src / "badprofile.xa").write_bytes(bytes(data))

    out = tmp_path / "out"
    res = decode_corpus(src, out, bucket_granularity=16)
    assert res.converted == len(expect)
    assert len(res.failed) == 2
    assert any("broken" in k for k in res.failed)
    assert any("badprofile" in k for k in res.failed)


def test_corpus_multihost_sharding(tmp_path, corpus):
    src, expect = corpus
    outs = []
    total = 0
    for rank in range(3):
        out = tmp_path / f"out{rank}"
        res = decode_corpus(
            src,
            out,
            bucket_granularity=16,
            process_index=rank,
            process_count=3,
        )
        assert not res.failed
        total += res.converted
        outs.append(out)
    assert total == len(expect)
    produced = {p.stem for o in outs for p in o.glob("*.wav")}
    assert produced == set(expect)


def test_corpus_on_mesh(tmp_path, corpus):
    import jax

    from bjxa_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    src, expect = corpus
    out = tmp_path / "out"
    mesh = make_mesh(jax.devices(), dp=8, sp=1)
    res = decode_corpus(src, out, bucket_granularity=16, mesh=mesh)
    assert res.converted == len(expect)
    for stem, wav in expect.items():
        assert (out / f"{stem}.wav").read_bytes() == wav
