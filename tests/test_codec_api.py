"""API-misuse contract tests — the ``test_libbjxa_api.c`` port.

Every reference errno assertion maps to a typed-exception assertion here
(EFAULT->BjxaFault, EINVAL->BjxaInvalidState, ENOBUFS->BjxaBufferError,
EPROTO->BjxaProtocolError, EIO->BjxaIOError, EBADF->BjxaBadFileError),
plus the streaming-progress semantics of the incremental codec.
"""

import errno
import io

import numpy as np
import pytest

from bjxa_tpu import (
    BjxaBadFileError,
    BjxaBufferError,
    BjxaFault,
    BjxaInvalidState,
    BjxaIOError,
    BjxaProtocolError,
    dump_pcm,
)
from bjxa_tpu.codec import Decoder, Encoder
from bjxa_tpu.format.riff import RiffFormat
from bjxa_tpu.format.hexdsl import hex_to_bytes

VALID_HEADER = hex_to_bytes(
    """
    4b574431 | KWD1
    42000000 | 66 data_len
    20000000 | 32 samples
    44ac     | 44100
    08 02    | 8 bits stereo
    00000000 | loop
    0000 0000 0000 0000 | bef
    00000000 | pad
    """
)
VALID_BLOCKS = bytes(66)


def ready_decoder() -> Decoder:
    dec = Decoder()
    dec.parse_header(VALID_HEADER)
    return dec


# -- errno mapping sanity ---------------------------------------------------


def test_errno_values():
    assert BjxaFault.errno == errno.EFAULT
    assert BjxaInvalidState.errno == errno.EINVAL
    assert BjxaBufferError.errno == errno.ENOBUFS
    assert BjxaProtocolError.errno == errno.EPROTO
    assert BjxaIOError.errno == errno.EIO
    assert BjxaBadFileError.errno == errno.EBADF


# -- lifecycle (test_memory_management analog) ------------------------------


def test_double_close():
    dec = Decoder()
    dec.close()
    with pytest.raises(BjxaInvalidState):
        dec.close()
    with pytest.raises(BjxaInvalidState):
        dec.parse_header(VALID_HEADER)


# -- header parsing ---------------------------------------------------------


def test_parse_header_misuse():
    dec = Decoder()
    with pytest.raises(BjxaFault):
        dec.parse_header(None)
    with pytest.raises(BjxaBufferError):
        dec.parse_header(b"")
    with pytest.raises(BjxaFault):
        dec.read_header(None)


def test_read_header_short_stream():
    dec = Decoder()
    with pytest.raises(BjxaIOError):
        dec.read_header(io.BytesIO(b"KWD1"))


def test_parse_header_transactional():
    dec = ready_decoder()
    fmt_before = dec.xa_format
    with pytest.raises(BjxaProtocolError):
        dec.parse_header(b"KWD2" + VALID_HEADER[4:])
    assert dec.xa_format == fmt_before  # old state intact
    assert dec.format().blocks == 1


# -- format query -----------------------------------------------------------


def test_format_before_header():
    dec = Decoder()
    with pytest.raises(BjxaInvalidState):
        dec.format()


# -- decoding ---------------------------------------------------------------


def test_decode_misuse():
    dec = Decoder()
    with pytest.raises(BjxaInvalidState):
        dec.decode(VALID_BLOCKS)
    dec = ready_decoder()
    with pytest.raises(BjxaFault):
        dec.decode(None)
    with pytest.raises(BjxaBufferError):
        dec.decode(b"")
    with pytest.raises(BjxaBufferError):
        dec.decode(bytes(65))  # one byte short of a stereo block


def test_decode_past_end():
    dec = ready_decoder()
    pcm = dec.decode(VALID_BLOCKS)
    assert pcm.shape == (32, 2)
    with pytest.raises(BjxaProtocolError):
        dec.decode(VALID_BLOCKS)


def test_decode_progress_counts_down():
    dec = ready_decoder()
    assert dec.format().blocks == 1
    assert dec.format().data_len_pcm == 32 * 2 * 2
    dec.decode(VALID_BLOCKS)
    assert dec.format().blocks == 0
    assert dec.format().data_len_pcm == 0


def test_streaming_equals_single_pass():
    """Block-at-a-time decode must byte-match the whole-file device path
    (the reference proves this property with its BJXA_SINGLE_PASS builds).
    """
    from bjxa_tpu.api import decode_xa, encode_pcm

    rng = np.random.default_rng(21)
    sig = rng.integers(-3000, 3000, size=(32 * 9 + 11, 2)).astype(np.int16)
    xa = encode_pcm(sig, 44100, 6, search=True)
    _, whole = decode_xa(xa)

    dec = Decoder()
    dec.parse_header(xa[:32])
    fmt = dec.xa_format
    out = []
    pos = 32
    for _ in range(fmt.blocks):
        out.append(dec.decode(xa[pos : pos + fmt.block_size_xa]))
        pos += fmt.block_size_xa
    np.testing.assert_array_equal(np.concatenate(out), whole)


def test_decode_invalid_profile_advances_left_channel():
    """A bad right-channel profile fails after the left channel's state
    advanced (src/libbjxa.c:633-646 sequencing)."""
    dec = ready_decoder()
    block = bytearray(VALID_BLOCKS)
    block[33] = 0xFF  # right-channel profile invalid
    with pytest.raises(BjxaProtocolError):
        dec.decode(bytes(block))


# -- riff dumping -----------------------------------------------------------


def test_riff_dump_misuse():
    dec = Decoder()
    with pytest.raises(BjxaInvalidState):
        dec.dump_riff_header()
    dec = ready_decoder()
    with pytest.raises(BjxaFault):
        dec.write_riff_header(None)
    buf = io.BytesIO()
    assert dec.write_riff_header(buf) == 44


def test_riff_dump_unwritable():
    dec = ready_decoder()

    class RO:
        def writable(self):
            return False

    with pytest.raises(BjxaBadFileError):
        dec.write_riff_header(RO())
    hdr = dec.dump_riff_header()
    assert len(hdr) == 44
    assert hdr[:4] == b"RIFF"


# -- pcm dumping ------------------------------------------------------------


def test_pcm_dump_misuse():
    with pytest.raises(BjxaFault):
        dump_pcm(None)
    with pytest.raises(BjxaBufferError):
        dump_pcm(np.empty((0,), np.int16))
    with pytest.raises(BjxaFault):
        Decoder.write_pcm(np.zeros(4, np.int16), None)

    class RO:
        def writable(self):
            return False

    with pytest.raises(BjxaBadFileError):
        Decoder.write_pcm(np.zeros(4, np.int16), RO())


# -- encoder ----------------------------------------------------------------


def test_encoder_misuse():
    enc = Encoder()
    with pytest.raises(BjxaInvalidState):
        enc.format()
    with pytest.raises(BjxaInvalidState):
        enc.dump_header()
    with pytest.raises(BjxaFault):
        enc.init(None, 6)
    with pytest.raises(BjxaInvalidState):
        enc.init(RiffFormat(data_len_pcm=64, samples_rate=44100, channels=1), 5)
    with pytest.raises(BjxaProtocolError):
        enc.init(RiffFormat(data_len_pcm=0, samples_rate=44100, channels=1), 6)


def test_encoder_progress_and_exhaustion():
    enc = Encoder()
    enc.init(RiffFormat(data_len_pcm=2 * 40, samples_rate=8000, channels=1), 4)
    fmt = enc.xa_format
    assert fmt.blocks == 2  # 40 samples -> 2 blocks (last partial)
    hdr = enc.dump_header()
    assert len(hdr) == 32 and hdr[:4] == b"KWD1"
    sig = np.arange(40, dtype=np.int16) * 100
    out = enc.encode(sig)
    assert len(out) == 2 * fmt.block_size
    assert enc.format().blocks == 0
    with pytest.raises(BjxaProtocolError):
        enc.encode(sig)


def test_encoder_streaming_matches_whole(tmp_path):
    from bjxa_tpu.api import encode_pcm

    rng = np.random.default_rng(5)
    sig = rng.integers(-2000, 2000, size=(32 * 6 + 3, 1)).astype(np.int16)
    whole = encode_pcm(sig, 44100, 6, search=False)

    enc = Encoder()
    enc.init(
        RiffFormat(data_len_pcm=sig.size * 2, samples_rate=44100, channels=1),
        6,
    )
    streamed = enc.dump_header() + enc.encode(sig)
    assert streamed == whole


# -- misuse paths around file objects ----------------------------------------


def test_decoder_file_misuse(tmp_path):
    dec = ready_decoder()
    with pytest.raises(BjxaFault):
        dec.read_header(None)
    with pytest.raises(BjxaFault):
        dec.decode(None)
    with pytest.raises(BjxaFault):
        dec.write_pcm(np.zeros((4, 2), np.int16), None)
    ro = tmp_path / "ro.bin"
    ro.write_bytes(b"x")
    with open(ro, "rb") as f:
        with pytest.raises(BjxaBadFileError):
            dec.write_pcm(np.zeros((4, 2), np.int16), f)
    # objects without writable()/readable() count as unusable, not errors
    with pytest.raises(BjxaBadFileError):
        dec.write_pcm(np.zeros((4, 2), np.int16), object())


def test_encoder_file_misuse(tmp_path):
    enc = Encoder()
    with pytest.raises(BjxaFault):
        enc.read_riff_header(None, 6)
    with pytest.raises(BjxaIOError):
        enc.read_riff_header(io.BytesIO(b"RIFF"), 6)
    enc.init(RiffFormat(data_len_pcm=64, samples_rate=44100, channels=1), 6)
    with pytest.raises(BjxaFault):
        enc.write_header(None)
    ro = tmp_path / "ro.bin"
    ro.write_bytes(b"x")
    with open(ro, "rb") as f:
        with pytest.raises(BjxaBadFileError):
            enc.write_header(f)
    with pytest.raises(BjxaFault):
        enc.encode(None)
    # close/misuse lifecycle
    enc.close()
    with pytest.raises(BjxaInvalidState):
        enc.encode(np.zeros((32, 1), np.int16))
    with pytest.raises(BjxaInvalidState):
        enc.close()


def test_encoder_accepts_raw_pcm_bytes():
    enc = Encoder()
    enc.init(RiffFormat(data_len_pcm=64, samples_rate=44100, channels=1), 6)
    sig = (np.arange(32, dtype=np.int16) * 64).tobytes()
    out = enc.encode(sig)
    assert len(out) == enc.xa_format.block_size
    with pytest.raises(BjxaBufferError):
        # fresh encoder, less than one whole block of frames
        enc2 = Encoder()
        enc2.init(
            RiffFormat(data_len_pcm=256, samples_rate=44100, channels=1), 6
        )
        enc2.encode(np.zeros((4, 1), np.int16))


def test_decode_max_blocks():
    from bjxa_tpu.api import encode_pcm

    sig = np.arange(96, dtype=np.int16)[:, None] * 17
    xa = encode_pcm(sig, 44100, 8, search=False)
    dec = Decoder()
    dec.parse_header(xa[:32])
    fmt = dec.xa_format
    pcm = dec.decode(xa[32:], max_blocks=1)
    assert pcm.shape[0] == 32
    assert dec.format().blocks == fmt.blocks - 1


# -- no-native fallback paths -------------------------------------------------


@pytest.fixture()
def no_native(monkeypatch):
    from bjxa_tpu import native

    monkeypatch.setattr(native, "available", lambda: False)


def test_fallback_streaming_matches_device(no_native):
    """The batched numpy fallback byte-matches the whole-file device path
    on a saturation-heavy random stream."""
    from bjxa_tpu.api import decode_xa, encode_pcm

    rng = np.random.default_rng(31)
    sig = rng.integers(-32768, 32768, size=(32 * 7 + 5, 2)).astype(np.int16)
    xa = encode_pcm(sig, 44100, 6, search=True)
    _, whole = decode_xa(xa)
    dec = Decoder()
    dec.parse_header(xa[:32])
    out = dec.decode(xa[32:])
    np.testing.assert_array_equal(out, whole)
    assert dec.format().blocks == 0


def test_fallback_invalid_profile_semantics(no_native):
    """Channel-sequential failure: blocks before the bad one decode, the
    left channel of the bad block still advances (src/libbjxa.c:633-646)."""
    hdr = hex_to_bytes(
        """
        4b574431 | KWD1
        84000000 | 132 data_len (2 stereo 8-bit blocks)
        40000000 | 64 samples
        44ac     | 44100
        08 02    | 8 bits stereo
        00000000 | loop
        0000 0000 0000 0000 | bef
        00000000 | pad
        """
    )
    dec = Decoder()
    dec.parse_header(hdr)
    block0 = bytes(66)
    bad = bytearray(66)
    bad[33] = 0xFF  # right channel invalid, left valid
    with pytest.raises(BjxaProtocolError):
        dec.decode(block0 + bytes(bad))
    # block 0 decoded and counted before the failure surfaced
    assert dec.format().blocks == 1


def test_fallback_encoder_matches_device(no_native):
    """Encoder fallback paths (truncate loop and device search) byte-match
    the one-shot API in both modes."""
    from bjxa_tpu.api import encode_pcm

    rng = np.random.default_rng(32)
    sig = rng.integers(-9000, 9000, size=(32 * 4 + 9, 2)).astype(np.int16)
    for search in (False, True):
        whole = encode_pcm(sig, 44100, 6, search=search)
        enc = Encoder()
        enc.init(
            RiffFormat(
                data_len_pcm=sig.size * 2, samples_rate=44100, channels=2
            ),
            6,
        )
        streamed = enc.dump_header() + enc.encode(sig, search=search)
        assert streamed == whole, f"search={search}"
