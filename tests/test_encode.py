"""Encoder tests: reference-compatible truncation mode, the profile-search
encoder's SNR floor (must exceed the measured reference baselines,
BASELINE.md), reconstruction consistency, and header round-trips.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bjxa_tpu.api import decode_xa, encode_pcm, wav_to_xa
from bjxa_tpu.format import parse_xa_header
from bjxa_tpu.ops.encode import encode_search
from bjxa_tpu.ops import numpy_ref

# round-trip SNR of the reference (truncation) encoder on square-mono.wav,
# measured during the survey — the search encoder must beat these.
REFERENCE_SNR = {4: 16.6, 6: 28.8, 8: 40.8}


def snr_db(x, y):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    return 10 * np.log10((x**2).sum() / ((x - y) ** 2).sum())


def synth_signal(n=44100, channels=1, seed=5):
    t = np.arange(n)[:, None]
    phases = np.array([[0.0, 1.1]])[:, :channels]
    sig = (
        9000 * np.sin(2 * np.pi * 440 * t / 44100 + phases)
        + 4000 * np.sin(2 * np.pi * 1327 * t / 44100)
        + 1500 * np.sin(2 * np.pi * 53 * t / 44100)
    )
    rng = np.random.default_rng(seed)
    sig += rng.normal(0, 60, size=(n, channels))
    return np.clip(sig, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize(
    "channels", [1, pytest.param(2, marks=pytest.mark.slow)]
)
def test_search_beats_reference_snr(bits, channels):
    sig = synth_signal(44100, channels)
    xa = encode_pcm(sig, 44100, bits, search=True)
    _, dec = decode_xa(xa)
    assert snr_db(sig, dec) > REFERENCE_SNR[bits] + 3.0


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_search_beats_truncation(bits):
    sig = synth_signal(22050)
    xa_t = encode_pcm(sig, 44100, bits, search=False)
    xa_s = encode_pcm(sig, 44100, bits, search=True)
    _, dec_t = decode_xa(xa_t)
    _, dec_s = decode_xa(xa_s)
    assert snr_db(sig, dec_s) > snr_db(sig, dec_t)


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_recon_matches_decoder(bits):
    """The search encoder's in-loop reconstruction must equal what the real
    decoder produces from its output — filter-in-the-loop exactness."""
    sig = synth_signal(32 * 40)
    lanes = sig.reshape(-1, 32, 1).astype(np.int32)
    profiles, coded, recon, _ = encode_search(
        jnp.asarray(lanes), jnp.zeros((1, 2), jnp.int32), bits=bits
    )
    xa = encode_pcm(sig, 44100, bits, search=True)
    _, dec = decode_xa(xa)
    np.testing.assert_array_equal(
        np.asarray(recon).reshape(-1), dec[:, 0]
    )


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_truncation_matches_numpy_oracle(bits, channels):
    """Truncation mode must equal the reference algorithm (profile 0, keep
    top bits, zero-pad the final partial block) — here via the numpy
    oracle; byte-compatibility with the C binary is covered by the
    differential suite."""
    sig = synth_signal(32 * 10 + 7, channels)  # partial last block
    xa = encode_pcm(sig, 44100, bits, search=False)
    fmt = parse_xa_header(xa)
    assert fmt.samples == len(sig)
    assert fmt.blocks == 11
    payload = np.frombuffer(xa[32:], np.uint8).reshape(
        fmt.blocks, channels, fmt.block_size
    )
    padded = np.zeros((fmt.blocks * 32, channels), np.int16)
    padded[: len(sig)] = sig
    for b in range(fmt.blocks):
        for c in range(channels):
            prof, data = numpy_ref.encode_truncate_block(
                padded[b * 32 : (b + 1) * 32, c], bits
            )
            assert payload[b, c, 0] == prof
            np.testing.assert_array_equal(payload[b, c, 1:], data)


def test_header_roundtrip():
    sig = synth_signal(1000, 2)
    xa = encode_pcm(sig, 22050, 6)
    fmt = parse_xa_header(xa)
    assert fmt.channels == 2
    assert fmt.samples == 1000
    assert fmt.samples_rate == 22050
    assert fmt.bits == 6
    assert fmt.data_len == fmt.blocks * fmt.block_size_xa


def test_wav_roundtrip_padding():
    """Odd-length stream: decode(encode(wav)) keeps exactly `samples`
    frames, discarding pad."""
    sig = synth_signal(32 * 5 + 13)
    xa = encode_pcm(sig, 44100, 8, search=True)
    _, dec = decode_xa(xa)
    assert dec.shape == (32 * 5 + 13, 1)
    assert snr_db(sig, dec) > REFERENCE_SNR[8]
