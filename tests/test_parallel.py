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


def test_transcode_step_on_mesh(devices):
    """The flagship transcode step (decode -> 80-profile re-encode -> global
    MSE) runs sharded over a (dp, cp) mesh and its re-encoded blocks
    byte-match the unsharded per-lane encoder."""
    import jax.numpy as jnp

    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel.mesh import make_mesh
    from bjxa_tpu.parallel.pipeline import corpus_shardings, transcode_step

    mesh = make_mesh(devices, dp=4, sp=2, axis_names=("dp", "cp"))
    rng = np.random.default_rng(17)
    bits, C, B, N = 6, 2, 5, 4
    # real encoded streams so every profile is valid
    blocks = np.stack(
        [
            np.frombuffer(
                encode_pcm(
                    rng.integers(
                        -20000, 20000, size=(B * 32, C)
                    ).astype(np.int16),
                    44100,
                    bits,
                    search=True,
                )[32:],
                np.uint8,
            ).reshape(B, C, -1).transpose(1, 0, 2)
            for _ in range(N)
        ]
    )
    states = np.zeros((N, C, 2), np.int32)

    blk_sh, st_sh = corpus_shardings(mesh)
    xa, mse = transcode_step(
        jax.device_put(jnp.asarray(blocks), blk_sh),
        jax.device_put(jnp.asarray(states, jnp.int32), st_sh),
        bits=bits,
    )
    xa = np.asarray(xa)
    assert xa.shape == (N, B, C, blocks.shape[-1])
    assert float(mse) >= 0.0
    # transcoding an already-XA-quantized signal must be lossless-stable:
    # re-encoding the decoded PCM reproduces the original blocks exactly
    want = blocks.transpose(0, 2, 1, 3)  # [N, B, C, S]
    np.testing.assert_array_equal(xa, want)
    assert float(mse) == 0.0


def test_decode_bytes_auto_sp_mesh(devices):
    """decode_bytes(mesh=) routes whole-file decode through the
    sequence-parallel device ring when an sp axis is available and the
    stream is long enough — bit-exact with the meshless path (SURVEY
    §2.5 block/sequence-parallel row; the user-facing wiring of
    decode_file_sharded)."""
    from bjxa_tpu.format import XA_HEADER_SIZE, dump_xa_header, parse_xa_header
    from bjxa_tpu.format.xa import XAFormat
    from bjxa_tpu.ops.decode import decode_bytes

    sp_mesh = make_mesh(devices, dp=8, sp=1, axis_names=("sp", "unused"))
    rng = np.random.default_rng(77)
    bits, channels, nblocks = 6, 2, 96
    blocks = random_blocks(rng, channels, nblocks, bits)
    size = block_size_for_bits(bits)
    payload = np.ascontiguousarray(
        blocks.transpose(1, 0, 2)
    ).tobytes()  # effective blocks: channel-major within each block
    fmt = XAFormat(
        data_len=nblocks * size * channels,
        samples=nblocks * 32,
        samples_rate=44100,
        bits=bits,
        channels=channels,
        initial_state=((11, -7), (3, 5)),
    )
    ref = decode_bytes(payload, fmt)
    via_mesh = decode_bytes(payload, fmt, mesh=sp_mesh, sp_min_blocks=64)
    np.testing.assert_array_equal(via_mesh, ref)
    # short streams fall back to the single-device pipeline
    short = decode_bytes(payload, fmt, mesh=sp_mesh, sp_min_blocks=10**6)
    np.testing.assert_array_equal(short, ref)


def test_corpus_words_flat_sharded(devices):
    """The packed-words lane-sharded corpus decode (flat per-shard D2H)
    reassembles bit-identically to the unsharded lane pipeline, including
    lane padding up to the mesh axis size."""
    from bjxa_tpu.ops.decode import (
        decode_batch_lanes,
        words_from_blocks_host,
    )
    from bjxa_tpu.parallel.sharded import decode_corpus_sharded_words

    mesh = make_mesh(devices, dp=8, sp=1)
    rng = np.random.default_rng(5)
    bits, C, B, N = 6, 2, 40, 11  # 22 lanes -> pads to 24
    blocks = np.stack([random_blocks(rng, C, B, bits) for _ in range(N)])
    blocks_t = np.ascontiguousarray(
        blocks.transpose(2, 3, 0, 1).reshape(B, -1, N * C)
    )
    states = rng.integers(-100, 100, size=(N * C, 2)).astype(np.int32)
    prof, words = words_from_blocks_host(blocks_t, bits)
    pcm_flat, reassemble = decode_corpus_sharded_words(
        prof, words, states, bits=bits, mesh=mesh
    )
    assert np.asarray(pcm_flat).ndim == 1  # flat on the wire
    pcm = reassemble(np.asarray(pcm_flat))
    ref_raw, _, _ = decode_batch_lanes(blocks_t, states, bits=bits)
    ref = np.asarray(ref_raw).reshape(B, 32, -1)[:, :, : N * C]
    np.testing.assert_array_equal(pcm, ref)


def test_encode_corpus_flat_sharded(devices):
    """The flat-output lane-sharded corpus encode matches the 3-D-output
    variant byte for byte after host reassembly."""
    from bjxa_tpu.parallel.sharded import (
        encode_corpus_sharded_flat,
        encode_corpus_sharded_lanes,
    )

    mesh = make_mesh(devices, dp=8, sp=1)
    rng = np.random.default_rng(6)
    B, L = 12, 10  # pads to 16 lanes
    pcm = rng.integers(-30000, 30000, size=(B, 32, L)).astype(np.int16)
    states = np.zeros((L, 2), np.int32)
    ref = np.asarray(
        encode_corpus_sharded_lanes(
            pcm, states, bits=6, search=False, mesh=mesh
        )
    )
    flat, reassemble = encode_corpus_sharded_flat(
        pcm, states, bits=6, search=False, mesh=mesh
    )
    assert np.asarray(flat).ndim == 1
    np.testing.assert_array_equal(reassemble(np.asarray(flat)), ref)


def test_corpus_lanes_sharded(devices):
    """The uint8 lane-major sharded decode (3-D results) still matches
    the unsharded lane pipeline — kept for callers that want device-side
    end states alongside the PCM."""
    from bjxa_tpu.ops.decode import decode_batch_lanes
    from bjxa_tpu.parallel.sharded import decode_corpus_sharded_lanes

    mesh = make_mesh(devices, dp=8, sp=1)
    rng = np.random.default_rng(21)
    bits, C, B, N = 4, 2, 16, 7  # 14 lanes -> pads to 16
    blocks = np.stack([random_blocks(rng, C, B, bits) for _ in range(N)])
    blocks_t = np.ascontiguousarray(
        blocks.transpose(2, 3, 0, 1).reshape(B, -1, N * C)
    )
    states = rng.integers(-50, 50, size=(N * C, 2)).astype(np.int32)
    pcm, end, valid = decode_corpus_sharded_lanes(
        blocks_t, states, bits=bits, mesh=mesh
    )
    ref_pcm, ref_end, ref_valid = decode_batch_lanes(
        blocks_t, states, bits=bits
    )
    np.testing.assert_array_equal(np.asarray(pcm), np.asarray(ref_pcm))
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))


def test_corpus_words_one_device_mesh():
    """A 1-device mesh runs the words shard path on any backend (on the
    real chip this traces the fused kernel under shard_map — the exact
    configuration the CLI auto-mesh produces on a single-chip host)."""
    import jax

    from bjxa_tpu.ops.decode import (
        decode_batch_lanes,
        words_from_blocks_host,
    )
    from bjxa_tpu.parallel.sharded import decode_corpus_sharded_words

    mesh = make_mesh(jax.devices()[:1], dp=1, sp=1)
    rng = np.random.default_rng(31)
    bits, C, B, N = 6, 2, 8, 3
    blocks = np.stack([random_blocks(rng, C, B, bits) for _ in range(N)])
    blocks_t = np.ascontiguousarray(
        blocks.transpose(2, 3, 0, 1).reshape(B, -1, N * C)
    )
    states = np.zeros((N * C, 2), np.int32)
    prof, words = words_from_blocks_host(blocks_t, bits)
    pcm_flat, reassemble = decode_corpus_sharded_words(
        prof, words, states, bits=bits, mesh=mesh
    )
    got = reassemble(np.asarray(pcm_flat))
    ref_raw, _, _ = decode_batch_lanes(blocks_t, states, bits=bits)
    ref = np.asarray(ref_raw).reshape(B, 32, -1)[:, :, : N * C]
    np.testing.assert_array_equal(got, ref)
