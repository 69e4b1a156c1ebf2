"""Multi-device tests on the virtual 8-way CPU mesh: corpus data
parallelism and sequence-parallel single-stream decode (ppermute boundary
fixed point), both verified bit-exact against the single-lane path.
"""

import jax
import numpy as np
import pytest

from bjxa_tpu.ops.decode import decode_arrays
from bjxa_tpu.parallel import (
    decode_corpus_sharded,
    decode_file_sharded,
    make_mesh,
)
from bjxa_tpu.ops.tables import block_size_for_bits


def random_blocks(rng, channels, nblocks, bits):
    size = block_size_for_bits(bits)
    blocks = rng.integers(0, 256, size=(channels, nblocks, size), dtype=np.uint8)
    factor = rng.integers(0, 5, size=(channels, nblocks))
    shift = rng.integers(0, 4, size=(channels, nblocks))
    blocks[:, :, 0] = (factor << 4 | shift).astype(np.uint8)
    return blocks


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_corpus_dp(devices):
    mesh = make_mesh(devices, dp=8, sp=1)
    rng = np.random.default_rng(0)
    bits, C, B, N = 6, 2, 25, 16
    blocks = np.stack([random_blocks(rng, C, B, bits) for _ in range(N)])
    states = np.zeros((N, C, 2), np.int32)
    pcm, end, valid = decode_corpus_sharded(
        blocks, states, bits=bits, mesh=mesh
    )
    assert np.asarray(valid).all()
    for i in range(N):
        ref, ref_end, _ = decode_arrays(
            blocks[i], states[i], bits=bits
        )
        np.testing.assert_array_equal(np.asarray(pcm[i]), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(end[i]), np.asarray(ref_end))


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("nblocks", [256, 301])
def test_file_sp(devices, channels, nblocks):
    mesh = make_mesh(devices, dp=1, sp=8, axis_names=("dp", "sp"))
    # use a pure 1-D sp mesh for the sharded decoder
    sp_mesh = make_mesh(devices, dp=8, sp=1, axis_names=("sp", "unused"))
    rng = np.random.default_rng(nblocks + channels)
    bits = 4
    blocks = random_blocks(rng, channels, nblocks, bits)
    state = rng.integers(-1000, 1000, size=(channels, 2)).astype(np.int32)
    pcm, valid, rounds = decode_file_sharded(
        blocks, state, bits=bits, mesh=sp_mesh, axis="sp", local_chunks=4
    )
    assert valid.all()
    ref, _, _ = decode_arrays(blocks, state, bits=bits)
    np.testing.assert_array_equal(pcm, np.asarray(ref))
    assert 1 <= rounds <= 8
