"""Differential tests: the JAX pipelines vs the plain-numpy oracle, and the
parallel fixed-point pipeline vs the sequential one, on randomized streams
(including saturation-heavy profiles and nonzero header predictor seeds).
"""

import numpy as np
import pytest

from bjxa_tpu.ops import numpy_ref
from bjxa_tpu.ops.decode import (
    decode_arrays,
    decode_arrays_fixpoint,
    decode_batch,
)
from bjxa_tpu.ops.tables import block_size_for_bits


def random_blocks(rng, channels, nblocks, bits, wild=False):
    size = block_size_for_bits(bits)
    blocks = rng.integers(0, 256, size=(channels, nblocks, size), dtype=np.uint8)
    # profile byte: valid factor 0-4, any range; "wild" biases toward
    # high gain + low range to provoke saturation
    factor = rng.integers(0, 5, size=(channels, nblocks))
    shift = (
        rng.integers(0, 3, size=(channels, nblocks))
        if wild
        else rng.integers(0, 16, size=(channels, nblocks))
    )
    blocks[:, :, 0] = (factor << 4 | shift).astype(np.uint8)
    return blocks


def oracle_decode(blocks, bits, state):
    st = state.copy()
    chans = []
    for c in range(blocks.shape[0]):
        chans.append(numpy_ref.decode_channel(blocks[c], bits, st[c]))
    return np.stack(chans, axis=-1), st


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("wild", [False, True])
def test_sequential_matches_oracle(bits, channels, wild):
    rng = np.random.default_rng(1234 + bits + channels)
    blocks = random_blocks(rng, channels, 37, bits, wild)
    state = rng.integers(-32768, 32768, size=(channels, 2)).astype(np.int32)
    pcm, end, valid = decode_arrays(blocks, state, bits=bits)
    ref_pcm, ref_state = oracle_decode(blocks, bits, state)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(pcm), ref_pcm)
    np.testing.assert_array_equal(np.asarray(end), ref_state)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("wild", [False, True])
def test_numpy_lanes_fixpoint_matches_oracle(bits, channels, wild):
    """The vectorized blocks-as-lanes numpy fixpoint (the batched
    streaming fallback) is bit-exact vs the serial oracle, including
    saturation-heavy profiles and nonzero header seeds."""
    rng = np.random.default_rng(4321 + bits * channels + wild)
    blocks = random_blocks(rng, channels, 53, bits, wild)
    state = rng.integers(-32768, 32768, size=(channels, 2)).astype(np.int32)
    st = state.copy()
    got = numpy_ref.decode_lanes_fixpoint(
        blocks.transpose(1, 0, 2), bits, st
    )
    ref_pcm, ref_state = oracle_decode(blocks, bits, state)
    np.testing.assert_array_equal(
        got, ref_pcm.reshape(-1, channels).astype(np.int16)
    )
    np.testing.assert_array_equal(st, ref_state)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize(
    "nblocks,chunks",
    [
        (64, 8),
        # the bigger odd-grid shapes double the compile bill for the same
        # property; they stay in the --slow/coverage matrix
        pytest.param(100, 7, marks=pytest.mark.slow),
        pytest.param(33, 32, marks=pytest.mark.slow),
    ],
)
def test_fixpoint_matches_sequential(bits, channels, nblocks, chunks):
    rng = np.random.default_rng(99 * bits + nblocks + channels)
    blocks = random_blocks(rng, channels, nblocks, bits, wild=True)
    state = rng.integers(-2048, 2048, size=(channels, 2)).astype(np.int32)
    seq_pcm, seq_end, _ = decode_arrays(blocks, state, bits=bits)
    par_pcm, par_end, valid, iters = decode_arrays_fixpoint(
        blocks, state, bits=bits, num_chunks=chunks
    )
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(par_pcm), np.asarray(seq_pcm))
    np.testing.assert_array_equal(np.asarray(par_end), np.asarray(seq_end))
    assert 1 <= int(iters) <= chunks


def test_batch_matches_oracle():
    rng = np.random.default_rng(7)
    bits, channels, nblocks, nfiles = 6, 2, 21, 5
    blocks = np.stack(
        [random_blocks(rng, channels, nblocks, bits) for _ in range(nfiles)]
    )
    states = rng.integers(-100, 100, size=(nfiles, channels, 2)).astype(
        np.int32
    )
    pcm, end, valid = decode_batch(blocks, states, bits=bits)
    assert np.asarray(valid).all()
    for n in range(nfiles):
        ref_pcm, ref_state = oracle_decode(blocks[n], bits, states[n])
        np.testing.assert_array_equal(np.asarray(pcm[n]), ref_pcm)
        np.testing.assert_array_equal(np.asarray(end[n]), ref_state)


def test_invalid_factor_flagged():
    rng = np.random.default_rng(3)
    blocks = random_blocks(rng, 1, 4, 8)
    blocks[0, 2, 0] = 0xFF  # factor 15
    state = np.zeros((1, 2), np.int32)
    _, _, valid = decode_arrays(blocks, state, bits=8)
    v = np.asarray(valid)
    assert not v[2, 0] and v[[0, 1, 3], 0].all()


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(11)
    for bits in (4, 6, 8):
        raw = rng.integers(0, 256, size=(50, bits * 4), dtype=np.uint8)
        unpacked = numpy_ref.unpack_blocks(raw, bits)
        repacked = numpy_ref.pack_blocks(unpacked, bits)
        np.testing.assert_array_equal(repacked, raw)
