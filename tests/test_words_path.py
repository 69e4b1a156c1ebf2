"""Packed-words decode path: bit-exactness against the production paths.

The words layout (profile plane + little-endian int32 payload words) is a
pure re-staging of the same bytes; every variant here must match the
lane-major scan pipeline sample-for-sample and state-for-state, including
the padding wrapper's end-state recovery.  Reference semantics:
``src/libbjxa.c:286-345`` (inflate) + ``:533-578`` (filter).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bjxa_tpu.ops.decode import (
    decode_batch_lanes,
    decode_batch_words,
    pack_words_from_lanes,
    words_from_blocks_host,
    words_to_blocks,
)
from bjxa_tpu.ops.pallas_decode import (
    fused_decode_lanes,
    fused_decode_words,
    fused_decode_words_padded,
)
from bjxa_tpu.ops.tables import BLOCK_SAMPLES


def _mk_lanes(bits, B, L, seed=0, max_factor=5):
    rng = np.random.default_rng(seed)
    S = 4 * bits + 1
    blocks_t = rng.integers(0, 256, size=(B, S, L), dtype=np.uint8)
    factor = rng.integers(0, max_factor, size=(B, L))
    shift = rng.integers(0, 16, size=(B, L))
    blocks_t[:, 0, :] = (factor << 4 | shift).astype(np.uint8)
    state = rng.integers(-3000, 3000, size=(L, 2)).astype(np.int32)
    return blocks_t, state


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_pack_words_roundtrip(bits):
    blocks_t, _ = _mk_lanes(bits, B=6, L=16, seed=1)
    prof, words = pack_words_from_lanes(jnp.asarray(blocks_t), bits=bits)
    back = words_to_blocks(prof, words, bits=bits)
    np.testing.assert_array_equal(np.asarray(back), blocks_t)
    # host stager produces identical words
    hprof, hwords = words_from_blocks_host(blocks_t, bits)
    np.testing.assert_array_equal(hprof, np.asarray(prof))
    np.testing.assert_array_equal(hwords, np.asarray(words))


@pytest.mark.parametrize(
    "bits",
    [
        4,
        pytest.param(6, marks=pytest.mark.slow),
        pytest.param(8, marks=pytest.mark.slow),
    ],
)
def test_fused_words_kernel_matches_fused_lanes(bits):
    """Interpret-mode kernel equality at exact tile shapes."""
    B, L, sub, lt, bt = 8, 256, 16, 256, 4
    blocks_t, state = _mk_lanes(bits, B, L, seed=2)
    ref_pcm, ref_end = fused_decode_lanes(
        jnp.asarray(blocks_t), jnp.asarray(state), bits=bits,
        lane_tile=lt, block_tile=bt, sublanes=sub, interpret=True,
    )
    prof, words = pack_words_from_lanes(jnp.asarray(blocks_t), bits=bits)
    pcm4, end = fused_decode_words(
        prof, words, jnp.asarray(state), bits=bits,
        lane_tile=lt, block_tile=bt, sublanes=sub, interpret=True,
    )
    got = np.asarray(pcm4).reshape(B, BLOCK_SAMPLES, L)
    np.testing.assert_array_equal(got, np.asarray(ref_pcm))
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))


@pytest.mark.parametrize(
    "bits",
    [
        4,
        pytest.param(6, marks=pytest.mark.slow),
        pytest.param(8, marks=pytest.mark.slow),
    ],
)
@pytest.mark.parametrize(
    "shape", [(7, 96), pytest.param((5, 300), marks=pytest.mark.slow)]
)
def test_fused_words_padded(bits, shape):
    """Padding wrapper: odd block/lane counts, end-state recovery."""
    B, L = shape
    blocks_t, state = _mk_lanes(bits, B, L, seed=3)
    ref_pcm, ref_end = fused_decode_lanes(
        jnp.asarray(np.pad(blocks_t, ((0, (-B) % 4), (0, 0), (0, (-L) % 256)))),
        jnp.asarray(np.pad(state, ((0, (-L) % 256), (0, 0)))),
        bits=bits, lane_tile=256, block_tile=4, sublanes=16, interpret=True,
    )
    prof, words = pack_words_from_lanes(jnp.asarray(blocks_t), bits=bits)
    pcm4, end = fused_decode_words_padded(
        prof, words, jnp.asarray(state), bits=bits,
        lane_tile=256, block_tile=4, sublanes=16, interpret=True,
    )
    got = np.asarray(pcm4).reshape(pcm4.shape[0], BLOCK_SAMPLES, -1)
    np.testing.assert_array_equal(
        got[:B, :, :L], np.asarray(ref_pcm)[:B, :, :L]
    )
    # end state must equal the state after the last REAL block: recompute
    # from the reference PCM of row B-1
    ref = np.asarray(ref_pcm)
    want_end = np.stack(
        [ref[B - 1, -1, :L], ref[B - 1, -2, :L]], axis=-1
    ).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(end), want_end)


@pytest.mark.parametrize("bits", [4, 6, 8])
def test_decode_batch_words_matches_batch_lanes(bits):
    """Public batch API equality on the active backend (scan fallback on
    CPU), including the host lane-recovery contract."""
    B, L = 11, 10
    blocks_t, state = _mk_lanes(bits, B, L, seed=4, max_factor=6)
    ref_pcm, ref_end, ref_valid = decode_batch_lanes(
        jnp.asarray(blocks_t), jnp.asarray(state), bits=bits
    )
    prof, words = words_from_blocks_host(blocks_t, bits)
    pcm, end, valid = decode_batch_words(
        jnp.asarray(prof), jnp.asarray(words), jnp.asarray(state), bits=bits
    )
    got = np.asarray(pcm)
    got = got.reshape(got.shape[0], BLOCK_SAMPLES, -1)[:B, :, :L]
    np.testing.assert_array_equal(got, np.asarray(ref_pcm))
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))


def test_fused_words_states_only_device():
    """The words kernel's states-only variant (with_output=False): end
    states must match the full kernel's.  Compiled backends only — the
    targeted coverage pass runs it on the real chip."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a compiled TPU backend")
    bits = 8
    blocks_t, state = _mk_lanes(bits, B=8, L=16, seed=9)
    prof, words = pack_words_from_lanes(jnp.asarray(blocks_t), bits=bits)
    full_pcm, full_end = fused_decode_words_padded(
        prof, words, jnp.asarray(state), bits=bits
    )
    _none, end = fused_decode_words_padded(
        prof, words, jnp.asarray(state), bits=bits, with_output=False
    )
    assert _none is None
    np.testing.assert_array_equal(np.asarray(end), np.asarray(full_end))


def test_fused_words_pack_out_stores():
    """The paired-int32 store variant (the bench_pack_store ablation:
    two int16 samples per stored word) stays bit-exact — unpacking its
    words reproduces the int16-store kernel's PCM."""
    B, L, sub, lt, bt = 8, 256, 16, 256, 4
    blocks_t, state = _mk_lanes(6, B=B, L=L, seed=6)
    prof, words = pack_words_from_lanes(jnp.asarray(blocks_t), bits=6)
    ref_pcm, ref_end = fused_decode_words(
        prof, words, jnp.asarray(state), bits=6,
        lane_tile=lt, block_tile=bt, sublanes=sub, interpret=True,
    )
    packed, end = fused_decode_words(
        prof, words, jnp.asarray(state), bits=6,
        lane_tile=lt, block_tile=bt, sublanes=sub, interpret=True,
        pack_out=True,
    )
    w = np.asarray(packed).astype(np.int64)
    even = (((w & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int16)
    odd = (w >> 16).astype(np.int16)
    got = np.stack([even, odd], axis=2).reshape(B, BLOCK_SAMPLES, L)
    np.testing.assert_array_equal(
        got, np.asarray(ref_pcm).reshape(B, BLOCK_SAMPLES, L)
    )
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))


def test_pick_tiles_bounds_padded_memory():
    """Few lanes + a long block range must not pad to a full 2048-lane
    tile: a 1-lane 20736-block file previously compiled a ~2000x-padded
    program that exceeded HBM (fixed round 4).  The padded element count
    stays within a small multiple of the real one for every regime."""
    from bjxa_tpu.ops.pallas_decode import pick_tiles

    for L, B in [(1, 20736), (2, 20736), (32, 20672), (200, 10000),
                 (300, 10000), (1025, 9000)]:
        sub, lt, bt = pick_tiles(L, B)
        assert lt % sub == 0
        padded = -(-L // lt) * lt
        assert padded <= max(256, 2 * L), (L, B, lt)
    # the throughput regimes keep their measured-optimal tiles
    assert pick_tiles(8192, 256) == (32, 8192, 4)
    assert pick_tiles(4096, 256) == (32, 4096, 8)
    assert pick_tiles(2048, 64) == (16, 2048, 8)
    assert pick_tiles(32, 64) == (16, 2048, 8)  # small batches: one tile
