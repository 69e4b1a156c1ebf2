"""Corpus engine tests: batched decode of a synthetic corpus, manifest
resume, per-file failure isolation, and multi-host sharding of the file
list."""

import numpy as np
import pytest

from bjxa_tpu.api import encode_pcm, xa_to_wav
from bjxa_tpu.parallel.corpus import decode_corpus


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    # session-scoped (tests that mutate the directory copy it first); one
    # search-encoded file keeps realistic nonzero profiles in the mix,
    # the rest use truncation — these tests verify corpus DECODE, and the
    # 80-candidate search costs ~10 s of CPU-device encode per shape
    rng = np.random.default_rng(1)
    src = tmp_path_factory.mktemp("corpus") / "src"
    src.mkdir()
    expect = {}
    spec = [
        (4, 1, 100, False),
        (6, 2, 321, True),
        (6, 2, 33, False),
        (8, 1, 64 * 32, False),
        (8, 2, 257, False),
        (6, 1, 1000, False),
    ]
    for i, (bits, channels, samples, search) in enumerate(spec):
        sig = rng.integers(-20000, 20000, size=(samples, channels)).astype(
            np.int16
        )
        xa = encode_pcm(sig, 44100, bits, search=search)
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
    import shutil

    shared, expect = corpus
    src = tmp_path / "src"  # private copy: this test plants bad files
    shutil.copytree(shared, src)
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


# -- encode corpus ------------------------------------------------------------


def _write_wav(path, pcm, rate=44100):
    from bjxa_tpu.format import dump_pcm, dump_riff_header

    pcm = np.asarray(pcm, np.int16)
    path.write_bytes(
        dump_riff_header(pcm.size * 2, rate, pcm.shape[1]) + dump_pcm(pcm)
    )


@pytest.mark.parametrize(
    "search", (pytest.param(True, marks=pytest.mark.slow), False)
)
def test_encode_corpus_matches_per_file(tmp_path, search):
    """Batched corpus encode produces byte-identical XA to per-file
    encode_pcm — lanes must not interact."""
    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel.corpus import encode_corpus

    rng = np.random.default_rng(21)
    src = tmp_path / "wav"
    out = tmp_path / "xa"
    src.mkdir()
    cases = {}
    for i, (channels, samples) in enumerate(
        [(1, 333), (2, 333), (2, 64), (1, 512)]
    ):
        pcm = rng.integers(-32768, 32768, size=(samples, channels)).astype(
            np.int16
        )
        _write_wav(src / f"f{i}.wav", pcm)
        cases[f"f{i}"] = pcm

    res = encode_corpus(
        src, out, bits=6, search=search, bucket_granularity=4
    )
    assert res.converted == len(cases), res.failed
    for name, pcm in cases.items():
        want = encode_pcm(pcm, 44100, 6, search=search)
        got = (out / f"{name}.xa").read_bytes()
        assert got == want, name

    # resume: rerun skips everything
    res2 = encode_corpus(src, out, bits=6, search=search,
                         bucket_granularity=4)
    assert res2.converted == 0 and res2.skipped == len(cases)


def test_encode_corpus_on_mesh(tmp_path):
    """Mesh-sharded corpus encode is byte-identical to per-file encode."""
    import jax

    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel.corpus import encode_corpus
    from bjxa_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(23)
    src = tmp_path / "wav"
    out = tmp_path / "xa"
    src.mkdir()
    cases = {}
    for i, (channels, samples) in enumerate(
        [(1, 333), (2, 333), (2, 64), (1, 512)]
    ):
        pcm = rng.integers(-32768, 32768, size=(samples, channels)).astype(
            np.int16
        )
        _write_wav(src / f"f{i}.wav", pcm)
        cases[f"f{i}"] = pcm

    mesh = make_mesh(jax.devices(), dp=8, sp=1)
    res = encode_corpus(
        src, out, bits=6, search=False, bucket_granularity=4, mesh=mesh
    )
    assert res.converted == len(cases), res.failed
    for name, pcm in cases.items():
        want = encode_pcm(pcm, 44100, 6, search=False)
        assert (out / f"{name}.xa").read_bytes() == want, name


def test_encode_corpus_roundtrip(tmp_path):
    """Corpus encode -> corpus decode round-trips with bounded error."""
    from bjxa_tpu.parallel.corpus import decode_corpus, encode_corpus
    from bjxa_tpu.format import load_pcm
    from bjxa_tpu.format.riff import RIFF_HEADER_SIZE

    rng = np.random.default_rng(22)
    t = np.arange(2000)
    pcm = (
        10000 * np.sin(t / 20)[:, None] + rng.normal(0, 200, (2000, 1))
    ).astype(np.int16)
    src = tmp_path / "wav"
    mid = tmp_path / "xa"
    back = tmp_path / "wav2"
    src.mkdir()
    _write_wav(src / "tone.wav", pcm)

    assert encode_corpus(src, mid, bits=8).converted == 1
    assert decode_corpus(mid, back).converted == 1
    data = (back / "tone.wav").read_bytes()
    got = load_pcm(data[RIFF_HEADER_SIZE:], 1).astype(np.float64)
    ref = pcm.astype(np.float64)
    snr = 10 * np.log10((ref**2).sum() / ((ref - got) ** 2).sum())
    assert snr > 40, snr


def test_encode_corpus_reports_bad_wav(tmp_path):
    from bjxa_tpu.parallel.corpus import encode_corpus

    src = tmp_path / "wav"
    src.mkdir()
    (src / "junk.wav").write_bytes(b"not a wav")
    _write_wav(src / "ok.wav", np.zeros((64, 2), np.int16))
    res = encode_corpus(src, tmp_path / "xa")
    assert res.converted == 1
    assert "junk.wav" in next(iter(res.failed))


def test_corpus_explicit_paths_and_truncated(tmp_path, corpus):
    """Iterable-of-paths input and truncated-payload isolation, both
    directions."""
    from bjxa_tpu.parallel.corpus import decode_corpus, encode_corpus

    src, expect = corpus
    name = next(iter(expect))
    whole = (src / f"{name}.xa").read_bytes()
    trunc = tmp_path / "trunc.xa"
    trunc.write_bytes(whole[:-10])

    out = tmp_path / "out"
    res = decode_corpus(
        [src / f"{name}.xa", trunc], out, bucket_granularity=16
    )
    assert res.converted == 1
    assert "truncated payload" in res.failed[str(trunc)]
    assert (out / f"{name}.wav").read_bytes() == expect[name]

    # encode direction: truncated PCM body
    wav = tmp_path / "short.wav"
    ok = tmp_path / "ok.wav"
    _write_wav(ok, np.zeros((64, 1), np.int16))
    wav.write_bytes(ok.read_bytes()[:-8])
    res = encode_corpus([ok, wav], tmp_path / "xa", bits=6, search=False)
    assert res.converted == 1
    assert "truncated PCM payload" in res.failed[str(wav)]


def test_encode_corpus_explicit_paths(tmp_path):
    """encode_corpus accepts an explicit iterable of paths (not just a
    directory), mirroring decode_corpus."""
    rng = np.random.default_rng(41)
    pcm = rng.integers(-20000, 20000, size=(100, 1)).astype(np.int16)
    p = tmp_path / "one.wav"
    _write_wav(p, pcm)
    out = tmp_path / "out"
    from bjxa_tpu.parallel.corpus import encode_corpus

    res = encode_corpus([p], out, bits=6, search=False)
    assert res.converted == 1
    assert (out / "one.xa").exists()


def test_corpus_huge_file_routes_segmented(tmp_path, corpus, monkeypatch):
    """A file whose payload + PCM exceed the segmentation threshold skips
    the batcher and streams through the bounded-memory segmented decoder
    — same output bytes, manifest-recorded, resumable."""
    monkeypatch.setenv("BJXA_SEGMENT_THRESHOLD", "1")  # everything "huge"
    src, expect = corpus
    out = tmp_path / "out"
    res = decode_corpus(src, out, bucket_granularity=16)
    assert res.converted == len(expect), res.failed
    for stem, wav in expect.items():
        assert (out / f"{stem}.wav").read_bytes() == wav
    # rerun: manifest short-circuits everything
    res2 = decode_corpus(src, out, bucket_granularity=16)
    assert res2.converted == 0 and res2.skipped == len(expect)


def test_encode_corpus_huge_wav_routes_segmented(tmp_path, monkeypatch):
    """The encode mirror: an oversized WAV streams through the segmented
    encoder, byte-identical to the one-shot per-file encode."""
    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel.corpus import encode_corpus

    monkeypatch.setenv("BJXA_SEGMENT_THRESHOLD", "1")
    rng = np.random.default_rng(55)
    src = tmp_path / "wav"
    out = tmp_path / "xa"
    src.mkdir()
    cases = {}
    for i, (ch, samples) in enumerate([(1, 333), (2, 129)]):
        pcm = rng.integers(-30000, 30000, size=(samples, ch)).astype(
            np.int16
        )
        _write_wav(src / f"h{i}.wav", pcm)
        cases[f"h{i}"] = encode_pcm(pcm, 44100, 6, search=False)
    res = encode_corpus(src, out, bits=6, search=False)
    assert res.converted == len(cases), res.failed
    for stem, xa in cases.items():
        assert (out / f"{stem}.xa").read_bytes() == xa


def test_corpus_file_vanishes_between_parse_and_staging(
    tmp_path, corpus, monkeypatch
):
    """Payloads are read lazily at staging time (O(batch), not O(corpus),
    host memory); a file that becomes unreadable between the header parse
    and staging degrades per file while the rest of the batch converts."""
    import builtins
    import shutil as _shutil

    src, expect = corpus
    work = tmp_path / "src"
    _shutil.copytree(src, work)
    out = tmp_path / "out"
    target = str(work / "file2.xa")
    opens = {"n": 0}
    real_open = builtins.open

    def fake_open(file, *a, **k):
        if str(file) == target:
            opens["n"] += 1
            if opens["n"] > 1:  # header parse succeeded; staging fails
                raise OSError("vanished")
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    res = decode_corpus(work, out, bucket_granularity=16)
    assert any("file2" in p for p in res.failed), res.failed
    assert res.converted == len(expect) - 1
    for stem, wav in expect.items():
        if stem == "file2":
            continue
        assert (out / f"{stem}.wav").read_bytes() == wav


class _ShrinkingOpen:
    """builtins.open wrapper: the Nth+ open of ``target`` yields a file
    whose reads return ``keep`` bytes fewer than asked (a file that
    shrank after its header was parsed)."""

    def __init__(self, real_open, target, after=1, drop=10):
        self.real_open = real_open
        self.target = str(target)
        self.after = after
        self.drop = drop
        self.n = 0

    def __call__(self, file, *a, **k):
        f = self.real_open(file, *a, **k)
        if str(file) == self.target:
            self.n += 1
            if self.n > self.after:
                drop = self.drop
                real_read = f.read

                def short_read(nbytes=-1):
                    data = real_read(nbytes)
                    return data[: max(len(data) - drop, 0)]

                f.read = short_read
        return f


def test_corpus_file_shrinks_between_parse_and_staging(
    tmp_path, corpus, monkeypatch
):
    """A file that SHRINKS (short read, not open failure) after the
    header parse is reported as truncated; the batch still converts."""
    import builtins
    import shutil as _shutil

    src, expect = corpus
    work = tmp_path / "src"
    _shutil.copytree(src, work)
    out = tmp_path / "out"
    fake = _ShrinkingOpen(builtins.open, work / "file3.xa")
    monkeypatch.setattr(builtins, "open", fake)
    res = decode_corpus(work, out, bucket_granularity=16)
    assert any("file3" in p for p in res.failed), res.failed
    assert "truncated" in next(
        v for p, v in res.failed.items() if "file3" in p
    )
    assert res.converted == len(expect) - 1


def test_corpus_mesh_file_vanishes(tmp_path, corpus, monkeypatch):
    """The mesh staging branch degrades per file too."""
    import builtins
    import shutil as _shutil

    import jax

    from bjxa_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    src, expect = corpus
    work = tmp_path / "src"
    _shutil.copytree(src, work)
    out = tmp_path / "out"
    target = str(work / "file2.xa")
    opens = {"n": 0}
    real_open = builtins.open

    def fake_open(file, *a, **k):
        if str(file) == target:
            opens["n"] += 1
            if opens["n"] > 1:
                raise OSError("vanished")
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    mesh = make_mesh(jax.devices(), dp=8, sp=1)
    res = decode_corpus(work, out, bucket_granularity=16, mesh=mesh)
    assert any("file2" in p for p in res.failed), res.failed
    assert res.converted == len(expect) - 1


def test_corpus_huge_decode_error_paths(tmp_path, monkeypatch):
    """Oversized-file routing handles a corrupt profile and a shrinking
    stream without leaving partial outputs behind."""
    import builtins

    from bjxa_tpu.api import encode_pcm

    monkeypatch.setenv("BJXA_SEGMENT_THRESHOLD", "1")
    rng = np.random.default_rng(61)
    src = tmp_path / "src"
    src.mkdir()
    sig = rng.integers(-20000, 20000, size=(40 * 32, 2)).astype(np.int16)
    xa = bytearray(encode_pcm(sig, 44100, 6, search=False))
    xa[32 + 7 * 50] = 0xF0  # invalid factor mid-stream
    (src / "bad.xa").write_bytes(bytes(xa))
    good = encode_pcm(sig, 44100, 6, search=False)
    (src / "shrink.xa").write_bytes(good)

    fake = _ShrinkingOpen(builtins.open, src / "shrink.xa", drop=60)
    monkeypatch.setattr(builtins, "open", fake)
    out = tmp_path / "out"
    res = decode_corpus(src, out)
    assert len(res.failed) == 2 and res.converted == 0, res.failed
    assert not list(out.glob("*.wav")) and not list(out.glob("*.tmp"))


def test_encode_corpus_vanish_and_huge_error(tmp_path, monkeypatch):
    """Encode mirrors: staging-time vanish degrades per file, and an
    oversized WAV that shrinks mid-segment fails cleanly."""
    import builtins

    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel.corpus import encode_corpus

    rng = np.random.default_rng(62)
    src = tmp_path / "wav"
    src.mkdir()
    keep_pcm = rng.integers(-20000, 20000, size=(100, 1)).astype(np.int16)
    _write_wav(src / "keep.wav", keep_pcm)
    _write_wav(
        src / "gone.wav",
        rng.integers(-20000, 20000, size=(90, 1)).astype(np.int16),
    )
    target = str(src / "gone.wav")
    opens = {"n": 0}
    real_open = builtins.open

    def fake_open(file, *a, **k):
        if str(file) == target:
            opens["n"] += 1
            if opens["n"] > 1:
                raise OSError("vanished")
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    out = tmp_path / "xa"
    res = encode_corpus(src, out, bits=6, search=False)
    assert any("gone" in p for p in res.failed), res.failed
    assert res.converted == 1
    assert (out / "keep.xa").read_bytes() == encode_pcm(
        keep_pcm, 44100, 6, search=False
    )
    monkeypatch.setattr(builtins, "open", real_open)

    # oversized WAV shrinking mid-segment: clean failure, no partials
    monkeypatch.setenv("BJXA_SEGMENT_THRESHOLD", "1")
    src2 = tmp_path / "wav2"
    src2.mkdir()
    _write_wav(
        src2 / "h.wav",
        rng.integers(-20000, 20000, size=(300, 1)).astype(np.int16),
    )
    fake = _ShrinkingOpen(builtins.open, src2 / "h.wav", drop=100)
    monkeypatch.setattr(builtins, "open", fake)
    out2 = tmp_path / "xa2"
    res = encode_corpus(src2, out2, bits=6, search=False)
    assert res.failed and res.converted == 0
    assert not list(out2.glob("*.xa")) and not list(out2.glob("*.tmp"))


def test_encode_corpus_wav_shrinks_at_staging(tmp_path, monkeypatch):
    """A WAV whose body comes up short at staging time (after the header
    parse passed) is reported as truncated; the batch still converts."""
    import builtins

    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel.corpus import encode_corpus

    rng = np.random.default_rng(63)
    src = tmp_path / "wav"
    src.mkdir()
    keep = rng.integers(-20000, 20000, size=(100, 1)).astype(np.int16)
    _write_wav(src / "keep.wav", keep)
    _write_wav(
        src / "short.wav",
        rng.integers(-20000, 20000, size=(90, 1)).astype(np.int16),
    )
    fake = _ShrinkingOpen(builtins.open, src / "short.wav", drop=8)
    monkeypatch.setattr(builtins, "open", fake)
    out = tmp_path / "xa"
    res = encode_corpus(src, out, bits=6, search=False)
    assert any("short" in p for p in res.failed), res.failed
    assert "truncated" in next(
        v for p, v in res.failed.items() if "short" in p
    )
    assert res.converted == 1
    assert (out / "keep.xa").read_bytes() == encode_pcm(
        keep, 44100, 6, search=False
    )


def test_corpus_huge_uses_sp_ring_on_mesh(tmp_path, monkeypatch):
    """With a dp mesh, oversized files shard each segment over the same
    devices re-meshed as an sp ring instead of leaving N-1 devices idle."""
    import jax

    from bjxa_tpu.api import encode_pcm, xa_to_wav
    from bjxa_tpu.parallel import sharded
    from bjxa_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("BJXA_SEGMENT_THRESHOLD", "1")
    rng = np.random.default_rng(71)
    src = tmp_path / "src"
    src.mkdir()
    sig = rng.integers(-20000, 20000, size=(300 * 32, 2)).astype(np.int16)
    xa = encode_pcm(sig, 44100, 6, search=False)
    (src / "h.xa").write_bytes(xa)

    calls = []
    orig = sharded.decode_file_sharded

    def spy(*a, **k):
        calls.append(k.get("mesh"))
        return orig(*a, **k)

    monkeypatch.setattr(sharded, "decode_file_sharded", spy)
    mesh = make_mesh(jax.devices(), dp=8, sp=1)
    out = tmp_path / "out"
    res = decode_corpus(src, out, mesh=mesh)
    assert res.converted == 1, res.failed
    assert calls and all(m.shape["sp"] == 8 for m in calls)
    assert (out / "h.wav").read_bytes() == xa_to_wav(xa)
