"""Differential testing against the reference C implementation.

The reference builds with just ``cc -O2`` and an empty ``config.h``
(verified in SURVEY §4); when the reference tree is available the binary is
compiled once per session and every pipeline is compared byte-for-byte:
decode on all fixtures plus randomized synthetic streams, and
truncation-mode encode on fixture and synthetic WAVs.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from bjxa_tpu.api import encode_pcm, wav_to_xa, xa_to_wav
from bjxa_tpu.format import dump_riff_header, dump_pcm

REF_SRC = pathlib.Path("/root/reference/src")


@pytest.fixture(scope="session")
def ref_bjxa(tmp_path_factory):
    if not REF_SRC.is_dir():
        pytest.skip("reference sources not available")
    build = tmp_path_factory.mktemp("refbuild")
    (build / "config.h").write_text("")
    exe = build / "bjxa-ref"
    sources = [
        REF_SRC / "bjxa.c",
        REF_SRC / "bjxa_decode.c",
        REF_SRC / "bjxa_encode.c",
        REF_SRC / "libbjxa.c",
    ]
    subprocess.run(
        ["cc", "-O2", f"-I{build}", f"-I{REF_SRC}", "-o", str(exe)]
        + [str(s) for s in sources],
        check=True,
        capture_output=True,
    )
    return exe


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
        nblocks = int(rng.integers(1, 40))
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


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_fixture_encode_matches_reference(ref_bjxa, fixture_dir, bits):
    for stem in ("square-mono", "square-stereo"):
        wav = (fixture_dir / f"{stem}.wav").read_bytes()
        assert wav_to_xa(wav, bits, search=False) == ref_encode(
            ref_bjxa, wav, bits
        )
