"""Segmented bounded-memory device decode (VERDICT r3 item 2).

The format allows u32 ``data_len``/``samples`` (``bjxa.5.rst:77-79``) and
the reference streams with O(block) memory (``src/bjxa_decode.c:102-161``);
:func:`bjxa_tpu.ops.decode.iter_decode_segments` reproduces that bound at
device rate: fixed-size block segments stream through the device carrying
the exact predictor end state, bit-identical to the one-shot path.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from bjxa_tpu.api import encode_pcm
from bjxa_tpu.errors import BjxaProtocolError
from bjxa_tpu.format import XA_HEADER_SIZE
from bjxa_tpu.format.xa import XAFormat, dump_xa_header, parse_xa_header
from bjxa_tpu.ops.decode import decode_bytes, iter_decode_segments

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(0)
    sig = rng.integers(-25000, 25000, size=(700 * 32, 2)).astype(np.int16)
    xa = encode_pcm(sig, 44100, 6, search=False)
    fmt = parse_xa_header(xa)
    payload = xa[XA_HEADER_SIZE:]
    return fmt, payload, decode_bytes(payload, fmt)


@pytest.mark.parametrize("segment_blocks", [96, 700, 701, 1])
def test_segmented_bit_exact(stream, segment_blocks):
    """Any segment size reproduces the one-shot bytes exactly — the
    carried end state (last two samples per channel) is the whole
    cross-segment context (``bjxa.5.rst:186-187``)."""
    fmt, payload, ref = stream
    bio = io.BytesIO(payload)
    parts = list(
        iter_decode_segments(bio.read, fmt, segment_blocks=segment_blocks)
    )
    np.testing.assert_array_equal(np.concatenate(parts), ref)


def test_segmented_nonzero_header_state():
    """Header predictor seeds feed the first segment's anchor state."""
    rng = np.random.default_rng(3)
    nblocks, size = 40, 25
    raw = rng.integers(0, 256, size=(nblocks, 1, size), dtype=np.uint8)
    raw[:, :, 0] = (rng.integers(0, 5, size=(nblocks, 1)) << 4) | (
        rng.integers(0, 4, size=(nblocks, 1))
    )
    fmt = XAFormat(
        data_len=nblocks * size,
        samples=nblocks * 32,
        samples_rate=44100,
        bits=6,
        channels=1,
        initial_state=((1234, -567), (0, 0)),
    )
    payload = raw.tobytes()
    ref = decode_bytes(payload, fmt)
    parts = list(
        iter_decode_segments(io.BytesIO(payload).read, fmt, segment_blocks=7)
    )
    np.testing.assert_array_equal(np.concatenate(parts), ref)


def test_segmented_invalid_profile_prefix(stream):
    """An invalid profile in a later segment yields the exact valid
    prefix, then raises with the absolute block index."""
    fmt, payload, ref = stream
    bad = bytearray(payload)
    bad_block = 3 * 96 + 10
    bad[bad_block * fmt.block_size_xa] = 0xF0  # factor 15
    out = []
    with pytest.raises(BjxaProtocolError) as e:
        for p in iter_decode_segments(
            io.BytesIO(bytes(bad)).read, fmt, segment_blocks=96
        ):
            out.append(p)
    assert f"block {bad_block}" in str(e.value)
    np.testing.assert_array_equal(
        np.concatenate(out), ref[: bad_block * 32]
    )


def test_segmented_truncated_prefix(stream):
    """Truncation mid-segment decodes the complete blocks present, then
    raises EOFError (the CLI prints the reference's fread label)."""
    fmt, payload, ref = stream
    cut = (2 * 96 + 5) * fmt.block_size_xa + 7
    out = []
    with pytest.raises(EOFError):
        for p in iter_decode_segments(
            io.BytesIO(payload[:cut]).read, fmt, segment_blocks=96
        ):
            out.append(p)
    np.testing.assert_array_equal(
        np.concatenate(out), ref[: (2 * 96 + 5) * 32]
    )


def test_cli_segmented_matches_oneshot(tmp_path, stream):
    """`decode --segment-blocks` produces byte-identical WAV output."""
    from tests.test_cli import run_cli

    fmt, payload, _ = stream
    xa = dump_xa_header(fmt) + payload
    code, one, err = run_cli(["decode", "--devices", "1"], stdin=xa)
    assert code == 0, err
    code, seg, err = run_cli(
        ["decode", "--segment-blocks", "128"], stdin=xa
    )
    assert code == 0, err
    assert seg == one


def _child_rss_kb(args, env):
    """Run the CLI in a child process; return (exit, ru_maxrss in KiB)."""
    prog = (
        "import resource, sys\n"
        "from bjxa_tpu import cli\n"
        "rc = cli.main(['bjxa'] + %r)\n"
        "sys.stderr.write('RSSKB %%d\\n'"
        " %% resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)\n"
        "sys.exit(rc)\n" % (args,)
    )
    res = subprocess.run(
        [sys.executable, "-c", prog],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    rss = None
    for line in res.stderr.splitlines():
        if line.startswith("RSSKB "):
            rss = int(line.split()[1])
    assert rss is not None, res.stderr
    return res.returncode, rss


def test_segmented_decode_bounded_rss(tmp_path):
    """Peak RSS of a segmented big-file decode stays far below the file's
    payload + PCM footprint (VERDICT r3 item 2 'done' criterion).

    The big file is ~37 MB of XA / ~190 MB of PCM; a ~1 MB control file
    decoded by the same child-process flow measures the interpreter + JAX
    baseline.  Each decode runs twice and the second (compile-cache-warm)
    run is measured, so XLA compile spikes don't pollute the bound.
    """
    rng = np.random.default_rng(9)
    seg = 8192
    nblocks = 91 * seg  # 745472 blocks: 37.3 MB payload, 190.8 MB PCM
    size = 25

    def make(path, nb):
        raw = rng.integers(0, 256, size=(nb, 2, size), dtype=np.uint8)
        raw[:, :, 0] = (rng.integers(0, 5, size=(nb, 2)) << 4) | (
            rng.integers(0, 4, size=(nb, 2))
        )
        fmt = XAFormat(
            data_len=nb * 2 * size,
            samples=nb * 32,
            samples_rate=44100,
            bits=6,
            channels=2,
            initial_state=((0, 0), (0, 0)),
        )
        path.write_bytes(dump_xa_header(fmt) + raw.tobytes())

    big = tmp_path / "big.xa"
    small = tmp_path / "small.xa"
    make(big, nblocks)
    make(small, 2 * seg)

    env = dict(os.environ)
    env["BJXA_PLATFORM"] = "cpu"
    env.pop("BJXA_DEVICES", None)

    def run(path):
        args = [
            "decode",
            "--segment-blocks",
            str(seg),
            str(path),
            str(tmp_path / "out.wav"),
        ]
        _child_rss_kb(args, env)  # warm the persistent compile cache
        code, rss = _child_rss_kb(args, env)
        assert code == 0
        return rss

    rss_small = run(small)
    rss_big = run(big)
    # identical compiled shapes, so the delta is pure per-file memory:
    # O(segment), not O(file) — far below the 228 MB payload+PCM total.
    assert rss_big - rss_small < 100 * 1024, (rss_big, rss_small)


# -- segmented encode (the encode mirror) -----------------------------------


@pytest.mark.parametrize("search", [True, False])
@pytest.mark.parametrize("nsamples", [700 * 32, 700 * 32 - 13])
def test_segmented_encode_bit_exact(search, nsamples):
    """Segmented encode carries the exact search state between segments:
    bytes identical to the one-shot encoder, including the zero-padded
    partial final block."""
    from bjxa_tpu.ops.encode import iter_encode_segments

    rng = np.random.default_rng(nsamples + search)
    pcm = rng.integers(-25000, 25000, size=(nsamples, 2)).astype(np.int16)
    want = encode_pcm(pcm, 44100, 6, search=search)
    body = pcm.astype("<i2").tobytes()
    got = b"".join(
        iter_encode_segments(
            io.BytesIO(body).read, 2, nsamples,
            bits=6, search=search, segment_blocks=96,
        )
    )
    assert got == want[XA_HEADER_SIZE:]


def test_segmented_encode_truncated_matches_streaming():
    """A truncated PCM stream yields exactly the whole blocks present
    (the streaming encoder's contract), then raises EOFError."""
    from bjxa_tpu.ops.encode import iter_encode_segments

    rng = np.random.default_rng(5)
    nsamples = 4 * 96 * 32
    pcm = rng.integers(-25000, 25000, size=(nsamples, 1)).astype(np.int16)
    want = encode_pcm(pcm, 44100, 6, search=True)
    cut_frames = 2 * 96 * 32 + 5 * 32 + 7  # mid-block, mid-frame is below
    body = pcm[:cut_frames].astype("<i2").tobytes() + b"\x01"
    out = []
    with pytest.raises(EOFError):
        for chunk in iter_encode_segments(
            io.BytesIO(body).read, 1, nsamples,
            bits=6, search=True, segment_blocks=96,
        ):
            out.append(chunk)
    got = b"".join(out)
    nblocks_whole = cut_frames // 32
    assert got == want[XA_HEADER_SIZE : XA_HEADER_SIZE + nblocks_whole * 25]


def test_cli_segmented_encode_matches_oneshot(tmp_path):
    """`encode --segment-blocks` produces byte-identical XA output, and a
    truncated body matches the non-segmented truncated path."""
    from bjxa_tpu.format import dump_pcm, dump_riff_header
    from tests.test_cli import run_cli

    rng = np.random.default_rng(8)
    pcm = rng.integers(-20000, 20000, size=(500 * 32 - 9, 2)).astype(
        np.int16
    )
    wav = dump_riff_header(pcm.size * 2, 44100, 2) + dump_pcm(pcm)
    code, one, err = run_cli(["encode"], stdin=wav)
    assert code == 0, err
    code, seg, err = run_cli(
        ["encode", "--segment-blocks", "128"], stdin=wav
    )
    assert code == 0, err
    assert seg == one

    cut = wav[: 44 + (300 * 32 + 11) * 4 + 2]
    code, one_t, err1 = run_cli(["encode"], stdin=cut)
    assert code == 1 and "End of file" in err1
    code, seg_t, err2 = run_cli(
        ["encode", "--segment-blocks", "128"], stdin=cut
    )
    assert code == 1 and "End of file" in err2
    assert seg_t == one_t


def test_segmented_decode_on_sp_mesh(stream):
    """Segmented decode composes with the sequence-parallel device ring:
    every segment shards over the 8-device mesh and the concatenated
    result is bit-identical (the pod-scale huge-file path)."""
    import jax

    from bjxa_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fmt, payload, ref = stream
    mesh = make_mesh(jax.devices(), dp=8, sp=1, axis_names=("sp", "_"))
    parts = list(
        iter_decode_segments(
            io.BytesIO(payload).read, fmt, segment_blocks=96, mesh=mesh
        )
    )
    np.testing.assert_array_equal(np.concatenate(parts), ref)

    # a bad profile in a later segment still reports the absolute block
    bad = bytearray(payload)
    bad_block = 2 * 96 + 7
    bad[bad_block * fmt.block_size_xa] = 0xF0
    out = []
    with pytest.raises(BjxaProtocolError) as e:
        for p in iter_decode_segments(
            io.BytesIO(bytes(bad)).read, fmt, segment_blocks=96, mesh=mesh
        ):
            out.append(p)
    assert f"block {bad_block}" in str(e.value)
    np.testing.assert_array_equal(
        np.concatenate(out), ref[: bad_block * 32]
    )


def test_cli_segmented_decode_error_paths(stream):
    """Segmented CLI decode reports truncation and bad profiles with the
    reference's labels and byte-matches the non-segmented error paths."""
    from tests.test_cli import run_cli

    fmt, payload, _ = stream
    xa = dump_xa_header(fmt) + payload

    cut = xa[: 32 + 96 * fmt.block_size_xa + 3]
    code, seg, err = run_cli(["decode", "--segment-blocks", "96"], stdin=cut)
    assert code == 1 and "End of file" in err
    code, one, _ = run_cli(["decode", "--devices", "1"], stdin=cut)
    assert code == 1 and seg == one

    bad = bytearray(xa)
    bad[32 + (96 + 5) * fmt.block_size_xa] = 0xF0
    code, seg, err = run_cli(
        ["decode", "--segment-blocks", "96"], stdin=bytes(bad)
    )
    assert code == 1 and "Protocol error" in err
    code, one, _ = run_cli(["decode", "--devices", "1"], stdin=bytes(bad))
    assert code == 1 and seg == one


def test_stream_api_parses_own_headers(tmp_path):
    """The public stream API (api.decode_xa_stream / encode_wav_stream)
    parses container headers itself when none is pre-supplied, matching
    the one-shot byte converters exactly."""
    from bjxa_tpu.api import (
        decode_xa_stream,
        encode_wav_stream,
        wav_to_xa,
        xa_to_wav,
    )
    from bjxa_tpu.format import dump_pcm, dump_riff_header

    rng = np.random.default_rng(81)
    pcm = rng.integers(-20000, 20000, size=(200 * 32 - 5, 2)).astype(
        np.int16
    )
    wav = dump_riff_header(pcm.size * 2, 44100, 2) + dump_pcm(pcm)

    out = io.BytesIO()
    fmt = encode_wav_stream(
        io.BytesIO(wav), out, 6, search=False, segment_blocks=64
    )
    assert out.getvalue() == wav_to_xa(wav, 6, search=False)
    assert fmt.samples == pcm.shape[0]

    xa = out.getvalue()
    out2 = io.BytesIO()
    decode_xa_stream(io.BytesIO(xa), out2, segment_blocks=64)
    assert out2.getvalue() == xa_to_wav(xa)
