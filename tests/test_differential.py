"""Differential testing against the reference C implementation.

The reference builds with just ``cc -O2`` and an empty ``config.h``
(verified in SURVEY §4); when the reference tree is available the binary is
compiled once per session and every pipeline is compared byte-for-byte:
decode on all fixtures plus randomized synthetic streams, and
truncation-mode encode on fixture and synthetic WAVs.
"""

import os
import subprocess

import numpy as np
import pytest

from bjxa_tpu.api import encode_pcm, wav_to_xa, xa_to_wav
from bjxa_tpu.format import dump_riff_header, dump_pcm

# the ref_bjxa fixture (compiled reference binary) lives in conftest.py,
# shared with the C ABI parity tests.


def ref_decode(exe, xa: bytes) -> bytes:
    res = subprocess.run(
        [str(exe), "decode"], input=xa, capture_output=True, check=True
    )
    return res.stdout


def ref_encode(exe, wav: bytes, bits: int) -> bytes:
    res = subprocess.run(
        [str(exe), "encode", "--bits", str(bits)],
        input=wav,
        capture_output=True,
        check=True,
    )
    return res.stdout


@pytest.mark.parametrize(
    "name",
    [
        "square-mono-4.xa",
        "square-mono-6.xa",
        "square-mono-8.xa",
        "square-stereo-4.xa",
        "square-stereo-6.xa",
        "square-stereo-8.xa",
    ],
)
def test_decode_matches_reference(ref_bjxa, fixture_dir, name):
    xa = (fixture_dir / name).read_bytes()
    assert xa_to_wav(xa) == ref_decode(ref_bjxa, xa)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_decode_random_stream_matches_reference(ref_bjxa, bits, channels):
    """Random payload bytes (valid profiles) through both decoders."""
    rng = np.random.default_rng(bits * 10 + channels)
    nblocks = 53
    sig = rng.integers(-32768, 32768, size=(nblocks * 32 - 11, channels))
    xa = encode_pcm(sig.astype(np.int16), 44100, bits, search=True)
    assert xa_to_wav(xa) == ref_decode(ref_bjxa, xa)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_decode_nonzero_bef_state_matches_reference(ref_bjxa, bits, channels):
    """Headers may seed the predictor taps (befL/befR); exercise them."""
    import struct

    rng = np.random.default_rng(1000 + bits + channels)
    block_size = bits * 4 + 1
    nblocks = 23
    data_len = nblocks * block_size * channels
    samples = nblocks * 32
    bef = rng.integers(-32768, 32768, size=4)
    header = struct.pack(
        "<4sIIHBBI4hI",
        b"KWD1",
        data_len,
        samples,
        22050,
        bits,
        channels,
        0,
        *[int(x) for x in bef],
        0,
    )
    payload = rng.integers(0, 256, size=data_len, dtype=np.uint8)
    # valid profiles only
    for i in range(nblocks * channels):
        payload[i * block_size] = (
            rng.integers(0, 5) << 4 | rng.integers(0, 16)
        )
    xa = header + payload.tobytes()
    assert xa_to_wav(xa) == ref_decode(ref_bjxa, xa)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_truncation_encode_matches_reference(ref_bjxa, bits, channels):
    rng = np.random.default_rng(17 + bits + channels)
    sig = rng.integers(-32768, 32768, size=(32 * 21 + 5, channels)).astype(
        np.int16
    )
    wav = dump_riff_header(sig.size * 2, 44100, channels) + dump_pcm(sig)
    assert wav_to_xa(wav, bits, search=False) == ref_encode(
        ref_bjxa, wav, bits
    )


def test_decode_fuzz_matches_reference(ref_bjxa):
    """Randomized header fields (rate, loop, pad, bef seeds, truncated
    final block) and payloads across every (bits, channels, length) shape."""
    import struct

    rng = np.random.default_rng(2026)
    for trial in range(24):
        bits = int(rng.choice([4, 6, 8]))
        channels = int(rng.choice([1, 2]))
        block_size = bits * 4 + 1
        # fixed ladder bounds the compile set; payloads stay fully random
        nblocks = int(rng.choice([1, 2, 3, 5, 8, 13, 21, 34]))
        data_len = nblocks * block_size * channels
        # allow a truncated final block: samples within (max-32, max]
        max_samples = 32 * nblocks
        samples = int(max_samples - rng.integers(0, 32))
        if samples <= 0:
            samples = max_samples
        header = struct.pack(
            "<4sIIHBBI4hI",
            b"KWD1",
            data_len,
            samples,
            int(rng.integers(1, 65535)),
            bits,
            channels,
            int(rng.integers(0, 2**32)),  # loop: ignored
            *[int(x) for x in rng.integers(-32768, 32768, 4)],
            int(rng.integers(0, 2**32)),  # pad: ignored
        )
        payload = rng.integers(0, 256, size=data_len, dtype=np.uint8)
        for i in range(nblocks * channels):
            payload[i * block_size] = (
                rng.integers(0, 5) << 4 | rng.integers(0, 16)
            )
        xa = header + payload.tobytes()
        assert xa_to_wav(xa) == ref_decode(ref_bjxa, xa), (
            trial, bits, channels, nblocks, samples,
        )


def _mk_header(rng, bits, channels, nblocks, samples=None):
    import struct

    block_size = bits * 4 + 1
    data_len = nblocks * block_size * channels
    max_samples = 32 * nblocks
    if samples is None:
        samples = int(max_samples - rng.integers(0, 32))
        if samples <= 0:
            samples = max_samples
    return (
        struct.pack(
            "<4sIIHBBI4hI",
            b"KWD1",
            data_len,
            samples,
            int(rng.integers(1, 65535)),
            bits,
            channels,
            int(rng.integers(0, 2**32)),
            *[int(x) for x in rng.integers(-32768, 32768, 4)],
            int(rng.integers(0, 2**32)),
        ),
        data_len,
        block_size,
    )


def _mk_valid_payload(rng, data_len, block_size, nlanes):
    payload = rng.integers(0, 256, size=data_len, dtype=np.uint8)
    for i in range(nlanes):
        payload[i * block_size] = (
            rng.integers(0, 5) << 4 | rng.integers(0, 16)
        )
    return payload


def _cli_decode(xa: bytes):
    """Run the real CLI decode code path in-process on byte buffers.

    Returns (exit_code, stdout_bytes, stderr_text) — the triple the
    error-parity sweep compares against the compiled C binary.
    """
    import contextlib
    import io

    from bjxa_tpu import cli

    fin = io.BytesIO(xa)
    fout = io.BytesIO()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        code = cli._decode_stream(fin, fout, streaming=False)
    return code, fout.getvalue(), err.getvalue()


def _ref_decode_full(exe, xa: bytes):
    res = subprocess.run([str(exe), "decode"], input=xa, capture_output=True)
    return res.returncode, res.stdout, res.stderr.decode()


@pytest.mark.slow
def test_decode_fuzz_sweep_matches_reference(ref_bjxa):
    """O(1000)-stream randomized differential sweep vs the C binary.

    The reference's external evidence class is a 3700-file comparison
    against the original ``xa.exe`` (``bjxa.5.rst:197-199``); this sweep
    is the equivalent for this implementation: for every trial the REAL
    CLI code path and the compiled reference CLI must agree on the exit
    code, every stdout byte (including the valid-prefix PCM emitted
    before a failure), and the stderr failure label.  Trials mix happy
    paths, truncated tails (header-promised and mid-stream), and invalid
    profile factors planted at random (block, channel) positions.

    Block counts draw from a fixed ladder so the CPU-backend compile set
    stays bounded; payloads/headers/seeds/cut points are fully random.
    """
    rng = np.random.default_rng(31337)
    ladder = [1, 3, 8, 21, 64, 200]
    # BJXA_FUZZ_TRIALS scales the sweep for on-record deep runs (the
    # round-5 record ran 5000); the default stays CI-sized.
    n_trials = int(os.environ.get("BJXA_FUZZ_TRIALS", "1000"))
    counts = {"ok": 0, "proto": 0, "eof": 0}
    for trial in range(n_trials):
        bits = int(rng.choice([4, 6, 8]))
        channels = int(rng.choice([1, 2]))
        nblocks = int(rng.choice(ladder))
        header, data_len, block_size = _mk_header(rng, bits, channels, nblocks)
        payload = _mk_valid_payload(
            rng, data_len, block_size, nblocks * channels
        )
        kind = rng.choice(["ok", "proto", "eof"], p=[0.5, 0.25, 0.25])
        if kind == "proto" or (kind == "eof" and rng.random() < 0.3):
            # plant an invalid factor at a random (block, channel) — for
            # "eof" trials it may land before OR after the cut, racing
            # the protocol error against the short read like a real
            # corrupt+truncated file would
            b = int(rng.integers(0, nblocks))
            c = int(rng.integers(0, channels))
            payload[(b * channels + c) * block_size] = int(
                rng.integers(5, 16) << 4 | rng.integers(0, 16)
            )
        xa = header + payload.tobytes()
        if kind == "eof":
            xa = xa[: 32 + int(rng.integers(0, data_len))]
        ref_code, ref_out, ref_err = _ref_decode_full(ref_bjxa, xa)
        got_code, got_out, got_err = _cli_decode(xa)
        ctx = (trial, kind, bits, channels, nblocks)
        assert (got_code != 0) == (ref_code != 0), (ctx, got_err, ref_err)
        assert got_out == ref_out, ctx
        assert got_err == ref_err, (ctx, got_err, ref_err)
        counts[str(kind)] += 1
    assert sum(counts.values()) == n_trials


@pytest.mark.slow
def test_encode_truncated_parity_sweep(ref_bjxa):
    """Truncated WAV bodies through encode: the reference's streaming
    loop writes the XA header and every complete block before the short
    fread fails (``src/bjxa_encode.c:108-160``); stdout/exit/stderr must
    match byte for byte."""
    import contextlib
    import io

    from bjxa_tpu import cli

    rng = np.random.default_rng(777)
    for trial in range(120):
        bits = int(rng.choice([4, 6, 8]))
        channels = int(rng.choice([1, 2]))
        frames = int(rng.integers(1, 400))
        sig = rng.integers(-32768, 32768, size=(frames, channels)).astype(
            np.int16
        )
        wav = dump_riff_header(sig.size * 2, 44100, channels) + dump_pcm(sig)
        cut = 44 + int(rng.integers(0, sig.size * 2))
        wav = wav[:cut]
        res = subprocess.run(
            [str(ref_bjxa), "encode", "--bits", str(bits)],
            input=wav,
            capture_output=True,
        )
        fin, fout, err = io.BytesIO(wav), io.BytesIO(), io.StringIO()
        with contextlib.redirect_stderr(err):
            code = cli._encode_stream(fin, fout, bits, search=False)
        ctx = (trial, bits, channels, frames, cut)
        assert (code != 0) == (res.returncode != 0), (ctx, err.getvalue())
        assert fout.getvalue() == res.stdout, ctx
        assert err.getvalue() == res.stderr.decode(), ctx


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_fixture_encode_matches_reference(ref_bjxa, fixture_dir, bits):
    for stem in ("square-mono", "square-stereo"):
        wav = (fixture_dir / f"{stem}.wav").read_bytes()
        assert wav_to_xa(wav, bits, search=False) == ref_encode(
            ref_bjxa, wav, bits
        )


def _cli_decode_segmented(xa: bytes, segment_blocks: int):
    """The segmented CLI decode path on byte buffers (same triple as
    :func:`_cli_decode`)."""
    import contextlib
    import io

    from bjxa_tpu import cli

    fin = io.BytesIO(xa)
    fout = io.BytesIO()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        code = cli._decode_stream(
            fin, fout, streaming=False, segment_blocks=segment_blocks
        )
    return code, fout.getvalue(), err.getvalue()


def test_segmented_decode_differential_sweep(ref_bjxa):
    """The segmented bounded-memory CLI path against the compiled C
    reference: happy, mid-stream-corrupt, and truncated streams must
    agree on exit code and output bytes with the reference's streaming
    block loop (which the segments emulate at device rate)."""
    rng = np.random.default_rng(99)
    for trial in range(12):
        bits = int(rng.choice([4, 6, 8]))
        channels = int(rng.choice([1, 2]))
        nblocks = int(rng.choice([8, 96, 97, 200]))
        header, data_len, _bs = _mk_header(rng, bits, channels, nblocks)
        block_size = (bits * 4 + 1) * channels
        payload = _mk_valid_payload(
            rng, data_len, bits * 4 + 1, nblocks * channels
        )
        data = header + payload.tobytes()
        kind = trial % 3
        if kind == 1:  # corrupt a mid-stream profile byte
            b = bytearray(data)
            b[32 + (nblocks // 2) * block_size] = 0xFF
            data = bytes(b)
        elif kind == 2:  # truncate mid-block
            data = data[: 32 + (nblocks // 2) * block_size + 3]
        seg = int(rng.choice([5, 32, 96]))
        code, out, _err = _cli_decode_segmented(data, seg)
        ref_code, ref_out, _ref_err = _ref_decode_full(ref_bjxa, data)
        assert (code == 0) == (ref_code == 0), (trial, code, ref_code)
        assert out == ref_out, (trial, bits, channels, nblocks, seg)


def test_native_cli_differential_sweep(ref_bjxa):
    """The native C CLI binary (built on the drop-in ABI) vs the compiled
    reference CLI: exit status, every stdout byte (including the
    valid-prefix PCM emitted before a failure) and the stderr failure
    label must match on randomized happy/corrupt/truncated streams."""
    from bjxa_tpu.native import abi

    ncli = abi.cli_path()
    if ncli is None:
        pytest.skip("no C compiler")

    rng = np.random.default_rng(4242)
    for trial in range(120):
        bits = int(rng.choice([4, 6, 8]))
        channels = int(rng.choice([1, 2]))
        nblocks = int(rng.choice([1, 3, 8, 21, 64]))
        header, data_len, block_size = _mk_header(rng, bits, channels, nblocks)
        payload = _mk_valid_payload(
            rng, data_len, block_size, nblocks * channels
        )
        kind = rng.choice(["ok", "proto", "eof"], p=[0.5, 0.25, 0.25])
        if kind == "proto" or (kind == "eof" and rng.random() < 0.3):
            b = int(rng.integers(0, nblocks))
            c = int(rng.integers(0, channels))
            payload[(b * channels + c) * block_size] = int(
                rng.integers(5, 16) << 4 | rng.integers(0, 16)
            )
        xa = header + payload.tobytes()
        if kind == "eof":
            xa = xa[: 32 + int(rng.integers(0, data_len))]
        ref = subprocess.run(
            [str(ref_bjxa), "decode"], input=xa, capture_output=True
        )
        got = subprocess.run(
            [str(ncli), "decode"], input=xa, capture_output=True
        )
        ctx = (trial, kind, bits, channels, nblocks)
        assert (got.returncode != 0) == (ref.returncode != 0), ctx
        assert got.stdout == ref.stdout, ctx
        assert got.stderr == ref.stderr, (ctx, got.stderr, ref.stderr)
