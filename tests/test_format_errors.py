"""Malformed-stream rejection matrix.

Every vector mirrors a case from the reference error suite
(``test/test_decode_error.sh:36-282``), written in the same annotated-hex
DSL, plus RIFF-side vectors derived from the validation rules in
``src/libbjxa.c:855-863``.
"""

import pytest

from bjxa_tpu import (
    BjxaBufferError,
    BjxaIOError,
    BjxaProtocolError,
    decode_xa,
    parse_riff_header,
    parse_xa_header,
)
from bjxa_tpu.format.hexdsl import hex_to_bytes


def xa_header(
    magic="4b574431",
    data_len="c0680a00",  # 682176
    samples="fc170a00",  # 661500
    rate="44ac",  # 44100
    bits="08",
    channels="01",
):
    return hex_to_bytes(
        f"""
        {magic}   | id
        {data_len}| nDataLen
        {samples} | nSamples
        {rate}    | nSamplesPerSec
        {bits}    | nBits
        {channels}| nChannels
        00000000  | nLoopPtr
        0000 0000 | befL
        0000 0000 | befR
        00000000  | pad
        """
    )


def test_empty_input():
    with pytest.raises(BjxaBufferError):
        parse_xa_header(b"")


def test_short_header():
    with pytest.raises(BjxaBufferError):
        parse_xa_header(xa_header()[:31])


def test_wrong_magic():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(magic="4b574432"))  # KWD2


def test_zero_data_len():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(data_len="00000000"))


def test_zero_samples():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(samples="00000000"))


def test_too_many_samples():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(samples="a1bb0d00"))  # 900001


def test_not_enough_samples():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(samples="2a000000"))  # 42


def test_zero_rate():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(rate="0000"))


def test_data_len_not_block_multiple():
    # 35 bytes is not a whole number of 33-byte blocks
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(
            xa_header(data_len="23000000", samples="10000000")
        )


def test_unknown_compression():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(bits="0c"))  # 12 bits


def test_home_studio():
    with pytest.raises(BjxaProtocolError):
        parse_xa_header(xa_header(channels="05"))


def test_truncated_payload():
    # valid header promising more data than provided -> EIO analog
    hdr = xa_header(data_len="21000000", samples="20000000")  # 33 bytes, 32 samples
    with pytest.raises(BjxaIOError):
        decode_xa(hdr + b"\x00" * 10)


INVALID_MONO_PROFILE = """
4b574431 | KWD1 (id)
19000000 | 25 (nDataLen)
20000000 | 32 (nSamples)
44ac     | 44100 (nSamplesPerSec)
06       | 6 (nBits)
01       | 1 (nChannels)
00000000 | 0 (nLoopPtr)
0000 0000| befL
0000 0000| befR
00000000 | 0 (pad)
ff       | block profile (invalid)
00000000 00000000 00000000 | block data
00000000 00000000 00000000 | block data
"""

INVALID_RIGHT_PROFILE = """
4b574431 | KWD1 (id)
32000000 | 50 (nDataLen)
20000000 | 32 (nSamples)
44ac     | 44100 (nSamplesPerSec)
06       | 6 (nBits)
02       | 2 (nChannels)
00000000 | 0 (nLoopPtr)
0000 0000| befL
0000 0000| befR
00000000 | 0 (pad)
00       | block profile
00000000 00000000 00000000 | block data
00000000 00000000 00000000 | block data
ff       | block profile (invalid)
00000000 00000000 00000000 | block data
00000000 00000000 00000000 | block data
"""


def test_invalid_mono_profile():
    with pytest.raises(BjxaProtocolError):
        decode_xa(hex_to_bytes(INVALID_MONO_PROFILE))


def test_invalid_right_channel_profile():
    with pytest.raises(BjxaProtocolError):
        decode_xa(hex_to_bytes(INVALID_RIGHT_PROFILE))


# ---------------------------------------------------------------------------
# RIFF/WAVE rejection matrix (src/libbjxa.c:855-863)
# ---------------------------------------------------------------------------


def riff_header(
    riff="52494646",
    riff_len="24b01400",
    wavefmt="57415645666d7420",
    fmt_len="10000000",
    fmt_tag="0100",
    channels="0100",
    rate="44ac0000",
    byte_rate="885801 00",
    frame="0200",
    sample_bits="1000",
    data="64617461",
    data_len="00b01400",
):
    return hex_to_bytes(
        f"""
        {riff}     | RIFF
        {riff_len} | riff length
        {wavefmt}  | WAVEfmt(sp)
        {fmt_len}  | fmt chunk length
        {fmt_tag}  | PCM tag
        {channels} | channels
        {rate}     | sample rate
        {byte_rate}| byte rate
        {frame}    | frame size
        {sample_bits} | bits per sample
        {data}     | data
        {data_len} | data length
        """
    )


def test_riff_roundtrip_ok():
    fmt = parse_riff_header(riff_header())
    assert fmt.channels == 1
    assert fmt.samples_rate == 44100
    assert fmt.data_len_pcm == 0x14B000


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(riff="52494600"),  # bad RIFF magic
        dict(wavefmt="57415645666d7400"),  # bad WAVEfmt magic
        dict(data="64617400"),  # bad data magic
        dict(riff_len="10000000"),  # riff length too small
        dict(fmt_len="12000000"),  # non-canonical fmt length
        dict(fmt_tag="0300"),  # IEEE float, not PCM
        dict(channels="0500"),  # 5 channels
        dict(rate="00000000"),  # zero rate
        dict(rate="ffff0000"),  # rate == UINT16_MAX
        dict(frame="0400"),  # bad block align for mono
        dict(byte_rate="00000000"),  # inconsistent byte rate
        dict(data_len="01b01400"),  # partial trailing frame
        dict(sample_bits="0800"),  # 8-bit samples
    ],
)
def test_riff_rejection(kwargs):
    with pytest.raises(BjxaProtocolError):
        parse_riff_header(riff_header(**kwargs))


def test_riff_short_buffer():
    with pytest.raises(BjxaBufferError):
        parse_riff_header(riff_header()[:43])


def test_stereo_odd_channel_block_data_len_rejected():
    """A stereo data_len that is a whole number of single-channel blocks
    but not of effective blocks is rejected at parse: the reference's
    parser accepts it and then ABORTS on the decode-format assert
    (src/libbjxa.c:597, verified SIGABRT) — here it is a clean EPROTO."""
    import struct

    import pytest

    from bjxa_tpu.errors import BjxaProtocolError
    from bjxa_tpu.format import parse_xa_header

    hdr = struct.pack(
        "<4sIIHBBI4hI", b"KWD1", 125, 49, 44100, 6, 2, 0, 0, 0, 0, 0, 0
    )
    with pytest.raises(BjxaProtocolError, match="effective blocks"):
        parse_xa_header(hdr)
    # the mono equivalent (data_len=125, 5 blocks) stays valid
    hdr = struct.pack(
        "<4sIIHBBI4hI", b"KWD1", 125, 155, 44100, 6, 1, 0, 0, 0, 0, 0, 0
    )
    assert parse_xa_header(hdr).blocks == 5
