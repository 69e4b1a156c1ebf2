"""Drop-in C ABI (libbjxa-compatible shared library) tests.

Exercises ``bjxa_tpu/native/bjxa_abi.cc`` through ctypes:

* golden bit-exactness — the full fixture set decoded through the C API
  matches the Python pipeline (itself pinned to the reference SHA-1s);
* the errno contract (EFAULT/EINVAL/ENOBUFS/EPROTO/EIO) for the misuse
  matrix the reference C API test covers (reference
  test/test_libbjxa_api.c);
* FILE*-based streaming through libc, mirroring the reference CLI driver
  flow (reference src/bjxa_decode.c:102-161);
* truncation-encode byte parity with the Python encoder and with the
  compiled reference binary;
* the search-encode extension and the install story (header + .so +
  pkg-config + a freshly compiled C client program).
"""

import ctypes
import errno
import os
import subprocess

import numpy as np
import pytest

from bjxa_tpu.api import encode_pcm, xa_to_wav
from bjxa_tpu.format import dump_pcm, dump_riff_header
from bjxa_tpu.native import abi

if abi.lib() is None:  # pragma: no cover - toolchain always present in CI
    pytest.skip("C++ toolchain unavailable", allow_module_level=True)

FIXTURES = [
    "square-mono-4.xa",
    "square-mono-6.xa",
    "square-mono-8.xa",
    "square-stereo-4.xa",
    "square-stereo-6.xa",
    "square-stereo-8.xa",
]

XA_HEADER = 32
RIFF_HEADER = 44


@pytest.fixture(scope="module")
def L():
    return abi.lib()


@pytest.fixture()
def dec(L):
    handle = ctypes.c_void_p(L.bjxa_decoder())
    yield handle
    if handle.value:
        L.bjxa_free_decoder(ctypes.byref(handle))


@pytest.fixture()
def enc(L):
    handle = ctypes.c_void_p(L.bjxa_encoder())
    yield handle
    if handle.value:
        L.bjxa_free_encoder(ctypes.byref(handle))


def last_errno() -> int:
    return ctypes.get_errno()


def parse_ok(L, dec, data: bytes) -> abi.CFormat:
    assert L.bjxa_parse_header(dec, data, len(data)) == XA_HEADER
    fmt = abi.CFormat()
    assert L.bjxa_decode_format(dec, ctypes.byref(fmt)) == 0
    return fmt


def abi_decode_all(L, dec, payload: bytes, fmt: abi.CFormat) -> bytes:
    """One whole-buffer bjxa_decode call, then LE-serialize via dump_pcm."""
    dst = ctypes.create_string_buffer(fmt.data_len_pcm)
    blocks = L.bjxa_decode(dec, dst, len(dst), payload, len(payload))
    assert blocks == fmt.blocks
    out = ctypes.create_string_buffer(fmt.data_len_pcm)
    assert (
        L.bjxa_dump_pcm(out, ctypes.cast(dst, ctypes.c_void_p), fmt.data_len_pcm)
        == 0
    )
    return out.raw


# ---------------------------------------------------------------------------
# golden bit-exactness


@pytest.mark.parametrize("name", FIXTURES)
def test_golden_decode_memory(L, dec, fixture_dir, name):
    xa = (fixture_dir / name).read_bytes()
    fmt = parse_ok(L, dec, xa)

    riff = ctypes.create_string_buffer(RIFF_HEADER)
    assert L.bjxa_dump_riff_header(dec, riff, RIFF_HEADER) == RIFF_HEADER
    pcm = abi_decode_all(L, dec, xa[XA_HEADER:], fmt)
    assert riff.raw + pcm == xa_to_wav(xa)


def test_progress_countdown_and_exhaustion(L, dec, fixture_dir):
    """Block-at-a-time decode: progress counts down inside the decoder and
    decoding past the end raises EPROTO (reference src/libbjxa.c:617)."""
    xa = (fixture_dir / "square-mono-6.xa").read_bytes()
    fmt = parse_ok(L, dec, xa)
    payload = xa[XA_HEADER:]

    out = bytearray()
    dst = ctypes.create_string_buffer(fmt.block_size_pcm)
    pos = 0
    pcm_left = fmt.data_len_pcm
    for _ in range(fmt.blocks):
        chunk = payload[pos : pos + fmt.block_size_xa]
        assert L.bjxa_decode(dec, dst, len(dst), chunk, len(chunk)) == 1
        take = min(fmt.block_size_pcm, pcm_left)  # truncated final block
        out += dst.raw[:take]
        pcm_left -= take
        pos += fmt.block_size_xa
    assert pcm_left == 0 and len(out) == fmt.data_len_pcm

    ctypes.set_errno(0)
    assert L.bjxa_decode(dec, dst, len(dst), payload, fmt.block_size_xa) == -1
    assert last_errno() == errno.EPROTO

    # the whole-buffer decode of the same stream is bit-identical
    dec2 = ctypes.c_void_p(L.bjxa_decoder())
    fmt2 = parse_ok(L, dec2, xa)
    dst2 = ctypes.create_string_buffer(fmt2.data_len_pcm)
    assert L.bjxa_decode(dec2, dst2, len(dst2), payload, len(payload)) == fmt2.blocks
    assert dst2.raw == bytes(out)
    L.bjxa_free_decoder(ctypes.byref(dec2))


def test_truncated_tail_stream(L, dec):
    """A stream whose last block is partial emits only the promised frames."""
    rng = np.random.default_rng(7)
    pcm = rng.integers(-3000, 3000, size=(40, 1), dtype=np.int16)
    xa = encode_pcm(pcm, 9000, bits=6, search=False)
    fmt = parse_ok(L, dec, xa)
    assert fmt.blocks == 2 and fmt.data_len_pcm == 80

    payload = xa[XA_HEADER:]
    dst = ctypes.create_string_buffer(fmt.block_size_pcm)
    assert L.bjxa_decode(dec, dst, len(dst), payload, fmt.block_size_xa) == 1
    first = bytes(dst.raw)
    # final block: only 8 frames (16 bytes) remain
    assert (
        L.bjxa_decode(dec, dst, len(dst), payload[fmt.block_size_xa :], fmt.block_size_xa)
        == 1
    )
    assert xa_to_wav(xa)[RIFF_HEADER:] == first + dst.raw[:16]


# ---------------------------------------------------------------------------
# FILE* streaming through libc (the reference CLI driver flow)


@pytest.fixture(scope="module")
def libc():
    c = ctypes.CDLL(None, use_errno=True)
    c.fopen.restype = ctypes.c_void_p
    c.fopen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    c.fclose.argtypes = [ctypes.c_void_p]
    c.fread.restype = ctypes.c_size_t
    c.fread.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_void_p]
    return c


@pytest.mark.parametrize("name", ["square-mono-4.xa", "square-stereo-8.xa"])
def test_golden_decode_file_streaming(L, libc, dec, fixture_dir, tmp_path, name):
    src = libc.fopen(str(fixture_dir / name).encode(), b"rb")
    out_path = tmp_path / "out.wav"
    dst = libc.fopen(str(out_path).encode(), b"wb")
    assert src and dst

    assert L.bjxa_fread_header(dec, src) == XA_HEADER
    fmt = abi.CFormat()
    assert L.bjxa_decode_format(dec, ctypes.byref(fmt)) == 0
    assert L.bjxa_fwrite_riff_header(dec, dst) == RIFF_HEADER

    buf_xa = ctypes.create_string_buffer(fmt.block_size_xa)
    buf_pcm = ctypes.create_string_buffer(fmt.block_size_pcm)
    pcm_left = fmt.data_len_pcm
    for _ in range(fmt.blocks):
        assert libc.fread(buf_xa, 1, fmt.block_size_xa, src) == fmt.block_size_xa
        assert (
            L.bjxa_decode(
                dec, buf_pcm, fmt.block_size_pcm, buf_xa, fmt.block_size_xa
            )
            == 1
        )
        take = min(fmt.block_size_pcm, pcm_left)  # truncated final block
        assert (
            L.bjxa_fwrite_pcm(ctypes.cast(buf_pcm, ctypes.c_void_p), take, dst)
            == 0
        )
        pcm_left -= take
    libc.fclose(src)
    libc.fclose(dst)
    assert out_path.read_bytes() == xa_to_wav((fixture_dir / name).read_bytes())


def test_fread_header_short_file(L, libc, dec, tmp_path):
    p = tmp_path / "short.xa"
    p.write_bytes(b"KWD1\x00")
    f = libc.fopen(str(p).encode(), b"rb")
    ctypes.set_errno(0)
    assert L.bjxa_fread_header(dec, f) == -1
    assert last_errno() == errno.EIO
    libc.fclose(f)


def test_fwrite_to_readonly_stream_fails(L, libc, dec, fixture_dir, tmp_path):
    xa = (fixture_dir / "square-mono-4.xa").read_bytes()
    parse_ok(L, dec, xa)
    p = tmp_path / "ro.bin"
    p.write_bytes(b"")
    f = libc.fopen(str(p).encode(), b"rb")  # read-only: fwrite must fail
    assert L.bjxa_fwrite_riff_header(dec, f) == -1
    pcm = (ctypes.c_int16 * 4)(1, 2, 3, 4)
    assert L.bjxa_fwrite_pcm(ctypes.cast(pcm, ctypes.c_void_p), 8, f) == -1
    libc.fclose(f)


# ---------------------------------------------------------------------------
# errno contract / misuse matrix (reference test/test_libbjxa_api.c)


def test_lifecycle_errno_matrix(L, enc):
    ctypes.set_errno(0)
    assert L.bjxa_free_decoder(None) == -1
    assert last_errno() == errno.EFAULT

    null = ctypes.c_void_p(None)
    ctypes.set_errno(0)
    assert L.bjxa_free_decoder(ctypes.byref(null)) == -1
    assert last_errno() == errno.EFAULT

    # an encoder is not a decoder: magic mismatch is EINVAL
    ctypes.set_errno(0)
    assert L.bjxa_free_decoder(ctypes.byref(enc)) == -1
    assert last_errno() == errno.EINVAL

    # successful free nulls the handle; freeing again is EFAULT
    d = ctypes.c_void_p(L.bjxa_decoder())
    assert L.bjxa_free_decoder(ctypes.byref(d)) == 0
    assert d.value is None
    ctypes.set_errno(0)
    assert L.bjxa_free_decoder(ctypes.byref(d)) == -1
    assert last_errno() == errno.EFAULT


def test_parse_header_errno_matrix(L, dec, enc, fixture_dir):
    xa = (fixture_dir / "square-mono-4.xa").read_bytes()

    for handle, err in [(None, errno.EFAULT), (enc, errno.EINVAL)]:
        ctypes.set_errno(0)
        assert L.bjxa_parse_header(handle, xa, len(xa)) == -1
        assert last_errno() == err

    ctypes.set_errno(0)
    assert L.bjxa_parse_header(dec, None, 32) == -1
    assert last_errno() == errno.EFAULT

    ctypes.set_errno(0)
    assert L.bjxa_parse_header(dec, xa, 31) == -1
    assert last_errno() == errno.ENOBUFS

    ctypes.set_errno(0)
    assert L.bjxa_parse_header(dec, b"JUNK" + xa[4:], len(xa)) == -1
    assert last_errno() == errno.EPROTO

    # a failed reparse is transactional: prior state intact
    parse_ok(L, dec, xa)
    before = abi.CFormat()
    L.bjxa_decode_format(dec, ctypes.byref(before))
    assert L.bjxa_parse_header(dec, b"KWD1" + b"\x00" * 28, 32) == -1
    after = abi.CFormat()
    assert L.bjxa_decode_format(dec, ctypes.byref(after)) == 0
    assert bytes(after) == bytes(before)


def test_decode_errno_matrix(L, dec, fixture_dir):
    xa = (fixture_dir / "square-mono-4.xa").read_bytes()
    dst = ctypes.create_string_buffer(4096)

    # before any header: EINVAL
    ctypes.set_errno(0)
    assert L.bjxa_decode(dec, dst, len(dst), xa, len(xa)) == -1
    assert last_errno() == errno.EINVAL
    ctypes.set_errno(0)
    fmt = abi.CFormat()
    assert L.bjxa_decode_format(dec, ctypes.byref(fmt)) == -1
    assert last_errno() == errno.EINVAL
    ctypes.set_errno(0)
    assert L.bjxa_dump_riff_header(dec, dst, RIFF_HEADER) == -1
    assert last_errno() == errno.EINVAL

    fmt = parse_ok(L, dec, xa)
    payload = xa[XA_HEADER:]

    for d, dl, s, sl, err in [
        (None, 64, payload, len(payload), errno.EFAULT),
        (dst, 64, None, len(payload), errno.EFAULT),
        (dst, fmt.block_size_pcm - 1, payload, len(payload), errno.ENOBUFS),
        (dst, len(dst), payload, fmt.block_size_xa - 1, errno.ENOBUFS),
    ]:
        ctypes.set_errno(0)
        assert L.bjxa_decode(dec, d, dl, s, sl) == -1
        assert last_errno() == err

    # invalid profile factor (0xff) in the stream: EPROTO
    bad = b"\xff" + payload[1:]
    ctypes.set_errno(0)
    assert L.bjxa_decode(dec, dst, len(dst), bad, fmt.block_size_xa) == -1
    assert last_errno() == errno.EPROTO


def test_riff_and_pcm_errno_matrix(L, dec, fixture_dir):
    xa = (fixture_dir / "square-mono-4.xa").read_bytes()
    parse_ok(L, dec, xa)
    buf = ctypes.create_string_buffer(64)

    ctypes.set_errno(0)
    assert L.bjxa_dump_riff_header(dec, buf, RIFF_HEADER - 1) == -1
    assert last_errno() == errno.ENOBUFS

    pcm = (ctypes.c_int16 * 4)(1, 2, 3, 4)
    pcm_p = ctypes.cast(pcm, ctypes.c_void_p)
    ctypes.set_errno(0)
    assert L.bjxa_dump_pcm(None, pcm_p, 8) == -1
    assert last_errno() == errno.EFAULT
    for n in (0, 3):  # empty and odd lengths
        ctypes.set_errno(0)
        assert L.bjxa_dump_pcm(buf, pcm_p, n) == -1
        assert last_errno() == errno.ENOBUFS

    assert L.bjxa_dump_pcm(buf, pcm_p, 8) == 0
    assert buf.raw[:8] == np.array([1, 2, 3, 4], "<i2").tobytes()


def test_encode_errno_matrix(L, enc, dec):
    fmt = abi.CFormat()
    pcm = np.zeros((64, 1), np.int16)
    dst = ctypes.create_string_buffer(1024)

    # uninitialized encoder
    ctypes.set_errno(0)
    assert L.bjxa_encode(enc, dst, len(dst), pcm.tobytes(), pcm.nbytes) == -1
    assert last_errno() == errno.EINVAL
    ctypes.set_errno(0)
    assert L.bjxa_encode_format(enc, ctypes.byref(fmt)) == -1
    assert last_errno() == errno.EINVAL
    ctypes.set_errno(0)
    assert L.bjxa_dump_header(enc, dst, XA_HEADER) == -1
    assert last_errno() == errno.EINVAL

    # init validation: sample_bits, bits, channels
    fmt = abi.CFormat(data_len_pcm=128, samples_rate=9000, sample_bits=8, channels=1)
    ctypes.set_errno(0)
    assert L.bjxa_encode_init(enc, ctypes.byref(fmt), 6) == -1
    assert last_errno() == errno.EINVAL
    fmt.sample_bits = 16
    ctypes.set_errno(0)
    assert L.bjxa_encode_init(enc, ctypes.byref(fmt), 5) == -1
    assert last_errno() == errno.EINVAL
    fmt.channels = 3
    ctypes.set_errno(0)
    assert L.bjxa_encode_init(enc, ctypes.byref(fmt), 6) == -1
    assert last_errno() == errno.EPROTO
    fmt.channels = 1
    fmt.data_len_pcm = 0  # no samples
    ctypes.set_errno(0)
    assert L.bjxa_encode_init(enc, ctypes.byref(fmt), 6) == -1
    assert last_errno() == errno.EPROTO

    # a decoder is not an encoder
    fmt = abi.CFormat(data_len_pcm=128, samples_rate=9000, sample_bits=16, channels=1)
    ctypes.set_errno(0)
    assert L.bjxa_encode_init(dec, ctypes.byref(fmt), 6) == -1
    assert last_errno() == errno.EINVAL


def test_parse_riff_errno_matrix(L):
    fmt = abi.CFormat()
    wav = dump_riff_header(256, 9000, 1)

    ctypes.set_errno(0)
    assert L.bjxa_parse_riff_header(None, wav, len(wav)) == -1
    assert last_errno() == errno.EFAULT
    ctypes.set_errno(0)
    assert L.bjxa_parse_riff_header(ctypes.byref(fmt), wav, 43) == -1
    assert last_errno() == errno.ENOBUFS
    ctypes.set_errno(0)
    assert L.bjxa_parse_riff_header(ctypes.byref(fmt), b"RIFX" + wav[4:], len(wav)) == -1
    assert last_errno() == errno.EPROTO

    assert L.bjxa_parse_riff_header(ctypes.byref(fmt), wav, len(wav)) == RIFF_HEADER
    assert (fmt.data_len_pcm, fmt.samples_rate, fmt.channels, fmt.sample_bits) == (
        256,
        9000,
        1,
        16,
    )


# ---------------------------------------------------------------------------
# encode parity


def abi_encode_wav(L, enc, wav: bytes, bits: int, search: bool = False) -> bytes:
    fmt = abi.CFormat()
    assert L.bjxa_parse_riff_header(ctypes.byref(fmt), wav, len(wav)) == RIFF_HEADER
    assert L.bjxa_encode_init(enc, ctypes.byref(fmt), bits) == 0
    if search:
        assert L.bjxa_tpu_encode_search(enc, 1) == 0
    hdr = ctypes.create_string_buffer(XA_HEADER)
    assert L.bjxa_dump_header(enc, hdr, XA_HEADER) == XA_HEADER
    payload = wav[RIFF_HEADER:]
    dst = ctypes.create_string_buffer(fmt.blocks * fmt.block_size_xa)
    assert L.bjxa_encode(enc, dst, len(dst), payload, len(payload)) == fmt.blocks
    return hdr.raw + dst.raw


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_encode_truncation_parity(L, enc, bits, channels):
    rng = np.random.default_rng(bits * 10 + channels)
    pcm = rng.integers(-20000, 20000, size=(517, channels), dtype=np.int16)
    wav = dump_riff_header(pcm.nbytes, 22050, channels) + dump_pcm(pcm)
    assert abi_encode_wav(L, enc, wav, bits) == encode_pcm(
        pcm, 22050, bits=bits, search=False
    )


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_encode_search_parity(L, enc, bits):
    rng = np.random.default_rng(99 + bits)
    t = np.arange(413)
    wave = 9000 * np.sin(t / 7.0) + rng.normal(0, 400, t.shape)
    pcm = wave.astype(np.int16).reshape(-1, 1)
    wav = dump_riff_header(pcm.nbytes, 22050, 1) + dump_pcm(pcm)
    assert abi_encode_wav(L, enc, wav, bits, search=True) == encode_pcm(
        pcm, 22050, bits=bits, search=True
    )


def test_encode_matches_reference_binary(L, enc, ref_bjxa):
    rng = np.random.default_rng(3)
    pcm = rng.integers(-30000, 30000, size=(333, 2), dtype=np.int16)
    wav = dump_riff_header(pcm.nbytes, 11025, 2) + dump_pcm(pcm)
    ref = subprocess.run(
        [str(ref_bjxa), "encode", "--bits", "6"],
        input=wav,
        capture_output=True,
        check=True,
    ).stdout
    assert abi_encode_wav(L, enc, wav, 6) == ref


# ---------------------------------------------------------------------------
# install story: header + versioned .so + pkg-config + a real C client


def test_install_and_c_client(L, tmp_path):
    paths = abi.install(tmp_path / "prefix")
    assert paths["lib"].exists() and paths["header"].exists()
    assert "Name: bjxa" in paths["pkgconfig"].read_text()
    assert paths["link"].resolve() == paths["lib"].resolve()

    # our own minimal C client: parse a header, check the derived format,
    # decode one block — compiled against the installed artifacts.
    client = tmp_path / "client.c"
    client.write_text(
        r"""
#include <assert.h>
#include <errno.h>
#include <stdint.h>
#include <stdio.h>
#include <string.h>
#include <bjxa.h>

int main(void) {
    /* 6-bit mono, one block, 32 samples, rate 9000 */
    uint8_t hdr[32] = "KWD1";
    hdr[4] = 25;   /* data_len */
    hdr[8] = 32;   /* samples */
    hdr[12] = 0x28; hdr[13] = 0x23;  /* 9000 */
    hdr[14] = 6; hdr[15] = 1;
    bjxa_decoder_t *dec = bjxa_decoder();
    bjxa_format_t fmt;
    assert(bjxa_parse_header(dec, hdr, sizeof hdr) == 32);
    assert(bjxa_decode_format(dec, &fmt) == 0);
    assert(fmt.blocks == 1 && fmt.block_size_xa == 25);
    assert(fmt.data_len_pcm == 64 && fmt.samples_rate == 9000);
    uint8_t block[25] = {0};
    int16_t pcm[32];
    assert(bjxa_decode(dec, pcm, sizeof pcm, block, sizeof block) == 1);
    for (int i = 0; i < 32; i++) assert(pcm[i] == 0);
    assert(bjxa_decode(dec, pcm, sizeof pcm, block, sizeof block) == -1);
    assert(errno == EPROTO);
    assert(strcmp(bjxa_tpu_version(), "0.5.0") == 0);
    assert(bjxa_free_decoder(&dec) == 0 && dec == NULL);
    puts("client-ok");
    return 0;
}
"""
    )
    exe = tmp_path / "client"
    prefix = tmp_path / "prefix"
    subprocess.run(
        [
            os.environ.get("CC", "cc"),
            "-O2",
            f"-I{prefix}/include",
            str(client),
            f"-L{prefix}/lib",
            "-lbjxa",
            "-o",
            str(exe),
        ],
        check=True,
        capture_output=True,
    )
    env = dict(os.environ, LD_LIBRARY_PATH=str(prefix / "lib"))
    res = subprocess.run([str(exe)], env=env, capture_output=True, check=True)
    assert res.stdout.strip() == b"client-ok"


def test_symbol_versions(L):
    """Every reference symbol resolves at its reference version node."""
    out = subprocess.run(
        ["nm", "-D", "--defined-only", str(abi.so_path())],
        capture_output=True,
        check=True,
        text=True,
    ).stdout
    for sym, node in [
        ("bjxa_decode", "LIBBJXA_0.1"),
        ("bjxa_parse_header", "LIBBJXA_0.1"),
        ("bjxa_fwrite_pcm", "LIBBJXA_0.1"),
        ("bjxa_encode", "LIBBJXA_0.5"),
        ("bjxa_parse_riff_header", "LIBBJXA_0.5"),
        ("bjxa_tpu_version", "LIBBJXA_TPU_0.5"),
    ]:
        assert f"{sym}@@{node}" in out
    # nothing internal leaks: every exported T symbol is bjxa_*
    for line in out.splitlines():
        if " T " in line:
            assert line.split(" T ")[1].startswith("bjxa_")


# ---------------------------------------------------------------------------
# native C CLI binary (built on the ABI; reference CLI surface)


@pytest.fixture(scope="module")
def ncli():
    exe = abi.cli_path()
    if exe is None:  # pragma: no cover - toolchain always present in CI
        pytest.skip("no C compiler")
    return exe


GOLDEN_WAV_SHA1 = {
    "square-mono-4.xa": "064c48434d77d41c7df3030f3e4a85972dcbac80",
    "square-mono-6.xa": "ce3991eda98db098e45e876944d8324302726a66",
    "square-mono-8.xa": "1c7bdc2f42bd87ebaceb8184312a1857a9f6d8de",
    "square-stereo-4.xa": "35d8815e712737824c61a02f603145594c0827b7",
    "square-stereo-6.xa": "96eac5430bb7a73dc4801449684a4844b9b917c8",
    "square-stereo-8.xa": "4b10d39db9abfb75bb3561d7a789ca5afb046c75",
}


@pytest.mark.parametrize("name", FIXTURES)
def test_ncli_golden_decode(ncli, fixture_dir, tmp_path, name):
    import hashlib

    out = tmp_path / "out.wav"
    subprocess.run(
        [str(ncli), "decode", str(fixture_dir / name), str(out)],
        check=True,
        capture_output=True,
    )
    got = hashlib.sha1(out.read_bytes()).hexdigest()
    assert got == GOLDEN_WAV_SHA1[name]


def test_ncli_stdio_modes(ncli, fixture_dir):
    xa = (fixture_dir / "square-mono-6.xa").read_bytes()
    want = xa_to_wav(xa)
    piped = subprocess.run(
        [str(ncli), "decode"], input=xa, capture_output=True, check=True
    ).stdout
    dashed = subprocess.run(
        [str(ncli), "decode", "-", "-"], input=xa, capture_output=True,
        check=True,
    ).stdout
    assert piped == want and dashed == want


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_ncli_encode_matches_reference_binary(ncli, ref_bjxa, bits):
    rng = np.random.default_rng(bits)
    pcm = rng.integers(-30000, 30000, size=(777, 2), dtype=np.int16)
    wav = dump_riff_header(pcm.nbytes, 22050, 2) + dump_pcm(pcm)
    ref = subprocess.run(
        [str(ref_bjxa), "encode", "--bits", str(bits)],
        input=wav,
        capture_output=True,
        check=True,
    ).stdout
    ours = subprocess.run(
        [str(ncli), "encode", "--bits", str(bits)],
        input=wav,
        capture_output=True,
        check=True,
    ).stdout
    assert ours == ref


def test_ncli_search_mode_beats_truncation(ncli):
    t = np.arange(32 * 64)
    pcm = (12000 * np.sin(t / 9.0)).astype(np.int16).reshape(-1, 1)
    wav = dump_riff_header(pcm.nbytes, 22050, 1) + dump_pcm(pcm)

    def snr(xa: bytes) -> float:
        out = np.frombuffer(xa_to_wav(xa)[RIFF_HEADER:], "<i2").astype(float)
        src = pcm.reshape(-1).astype(float)
        return 10 * np.log10((src**2).sum() / ((src - out) ** 2).sum())

    run = lambda *extra: subprocess.run(
        [str(ncli), "encode", "--bits", "4", *extra],
        input=wav,
        capture_output=True,
        check=True,
    ).stdout
    assert snr(run("--search")) > snr(run()) + 5.0


def test_ncli_error_paths(ncli, fixture_dir, tmp_path):
    def run(args, stdin=b""):
        return subprocess.run(
            [str(ncli), *args], input=stdin, capture_output=True
        )

    assert run([]).returncode == 1
    r = run(["frobnicate"])
    assert r.returncode == 1 and b"Unknown action" in r.stderr
    r = run(["decode", "/nonexistent.xa"])
    assert r.returncode == 1 and b"No such file" in r.stderr
    r = run(["decode", str(fixture_dir / "square-mono-4.xa"),
             str(tmp_path / "no" / "dir.wav")])
    assert r.returncode == 1
    r = run(["decode"], stdin=b"KWD1 truncated")
    assert r.returncode == 1 and b"bjxa_fread_header" in r.stderr
    r = run(["decode"], stdin=b"JUNK" + b"\x00" * 40)
    assert r.returncode == 1 and b"bjxa_fread_header" in r.stderr
    r = run(["encode", "--bits", "5"])
    assert r.returncode == 1 and b"Invalid --bits" in r.stderr
    r = run(["encode", "--bits"])
    assert r.returncode == 1 and b"Missing --bits" in r.stderr
    r = run(["encode", "--frobnicate"])
    assert r.returncode == 1 and b"Unknown option" in r.stderr
    r = run(["decode", "a", "b", "c"])
    assert r.returncode == 1 and b"Too many" in r.stderr
    # corrupt mid-stream profile byte: decode fails with EPROTO label
    xa = bytearray((fixture_dir / "square-mono-4.xa").read_bytes())
    xa[32 + 5 * 17] = 0xFF
    r = run(["decode"], stdin=bytes(xa))
    assert r.returncode == 1 and b"bjxa_decode" in r.stderr
    assert b"Protocol error" in r.stderr


def test_ncli_help(ncli):
    r = subprocess.run([str(ncli), "help"], capture_output=True)
    assert r.returncode == 0 and b"Usage:" in r.stdout


def test_install_includes_cli(L, tmp_path):
    paths = abi.install(tmp_path / "p")
    assert "bin" in paths
    r = subprocess.run(
        [str(paths["bin"]), "help"], capture_output=True
    )  # $ORIGIN/../lib rpath resolves the installed library
    assert r.returncode == 0 and b"Usage:" in r.stdout
