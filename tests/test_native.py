"""Native host library tests: bit-exact parity with the numpy oracle and
the device kernels (decode, truncation encode, search encode including the
float32 error-accumulation tie behavior)."""

import numpy as np
import pytest

from bjxa_tpu import native
from bjxa_tpu.ops import numpy_ref
from bjxa_tpu.ops.tables import block_size_for_bits

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def random_effective_blocks(rng, nblocks, channels, bits):
    size = block_size_for_bits(bits)
    blocks = rng.integers(
        0, 256, size=(nblocks, channels, size), dtype=np.uint8
    )
    factor = rng.integers(0, 5, size=(nblocks, channels))
    shift = rng.integers(0, 16, size=(nblocks, channels))
    blocks[:, :, 0] = (factor << 4 | shift).astype(np.uint8)
    return blocks


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_native_decode_matches_oracle(bits, channels):
    rng = np.random.default_rng(bits + channels)
    blocks = random_effective_blocks(rng, 40, channels, bits)
    state = rng.integers(-5000, 5000, size=(channels, 2)).astype(np.int32)
    ref_state = state.copy()
    pcm, done = native.decode_blocks(blocks, bits, state)
    assert done == 40
    for c in range(channels):
        ref = numpy_ref.decode_channel(
            blocks[:, c, :], bits, ref_state[c]
        )
        np.testing.assert_array_equal(pcm[:, c], ref)
    np.testing.assert_array_equal(state, ref_state)


def test_native_decode_invalid_profile():
    rng = np.random.default_rng(0)
    blocks = random_effective_blocks(rng, 10, 1, 8)
    blocks[4, 0, 0] = 0xFF
    state = np.zeros((1, 2), np.int32)
    pcm, done = native.decode_blocks(blocks, 8, state)
    assert done == 4


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_native_truncate_matches_oracle(bits, channels):
    rng = np.random.default_rng(3 * bits + channels)
    pcm = rng.integers(-32768, 32768, size=(32 * 13, channels)).astype(
        np.int16
    )
    out = native.encode_blocks(
        pcm, bits, np.zeros((channels, 2), np.int32), search=False
    )
    for b in range(13):
        for c in range(channels):
            prof, payload = numpy_ref.encode_truncate_block(
                pcm[b * 32 : (b + 1) * 32, c], bits
            )
            assert out[b, c, 0] == prof
            np.testing.assert_array_equal(out[b, c, 1:], payload)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_native_search_matches_device(bits, channels):
    """The host search encoder must pick identical profiles and bytes as
    the device kernel (same f32 error accumulation, same tie-breaks)."""
    import jax.numpy as jnp

    from bjxa_tpu.ops.deflate import deflate_blocks
    from bjxa_tpu.ops.encode import encode_search

    rng = np.random.default_rng(7 * bits + channels)
    t = np.arange(32 * 17)[:, None]
    sig = (
        6000 * np.sin(2 * np.pi * t / 100.0)
        + rng.normal(0, 800, size=(32 * 17, channels))
    ).astype(np.int16)

    state = np.zeros((channels, 2), np.int32)
    out_native = native.encode_blocks(sig, bits, state, search=True)

    lanes = sig.astype(np.int32).reshape(-1, 32, channels)
    profiles, coded, _recon, end = encode_search(
        jnp.asarray(lanes), jnp.zeros((channels, 2), jnp.int32), bits=bits
    )
    out_device = np.asarray(
        deflate_blocks(profiles, coded.transpose(0, 2, 1), bits)
    )
    np.testing.assert_array_equal(out_native, out_device)
    np.testing.assert_array_equal(state, np.asarray(end))


def test_native_rebuild_and_env_gate(tmp_path, monkeypatch):
    """The on-demand compile path builds a fresh .so, and BJXA_NO_NATIVE
    gates loading without touching the toolchain."""
    import importlib

    import bjxa_tpu.native as native

    # force a fresh module state with the env gate set
    monkeypatch.setenv("BJXA_NO_NATIVE", "1")
    importlib.reload(native)
    assert native.lib() is None
    assert not native.available()

    # now rebuild from source into a clean state
    monkeypatch.delenv("BJXA_NO_NATIVE")
    importlib.reload(native)
    so = native._SO
    backup = None
    if so.exists():
        backup = so.read_bytes()
        so.unlink()
    try:
        assert native._compile(), "native compile failed"
        assert so.exists()
        assert native.lib() is not None
        assert native.available()
    finally:
        if backup is not None and not so.exists():
            so.write_bytes(backup)
        importlib.reload(native)
