"""Pallas search-encoder kernel vs the scan encoder, interpret mode.

Small shapes: interpret mode executes op-by-op; equality here guarantees
identical profile selection (same candidate order + f32 error
accumulation) on real hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bjxa_tpu.ops.encode import encode_search_scan
from bjxa_tpu.ops.pallas_encode import encode_search_pallas_core


@pytest.mark.parametrize(
    "bits",
    [
        pytest.param(4, marks=pytest.mark.slow),
        6,
        pytest.param(8, marks=pytest.mark.slow),
    ],
)
def test_pallas_encode_matches_scan(bits):
    rng = np.random.default_rng(bits)
    B, L = 2, 16
    t = np.arange(B * 32)[:, None]
    sig = (
        7000 * np.sin(2 * np.pi * t / 40.0)
        + rng.normal(0, 500, size=(B * 32, L))
    ).astype(np.int16)
    pcm = sig.reshape(B, 32, L).astype(np.int32)
    state = rng.integers(-2000, 2000, size=(L, 2)).astype(np.int32)

    ref_prof, ref_coded, ref_recon, ref_end = encode_search_scan(
        jnp.asarray(pcm), jnp.asarray(state), bits=bits
    )
    prof, coded, recon, end = encode_search_pallas_core(
        jnp.asarray(pcm),
        jnp.asarray(state),
        bits=bits,
        lane_tile=16,
        block_tile=2,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prof), np.asarray(ref_prof))
    np.testing.assert_array_equal(
        np.asarray(coded), np.asarray(ref_coded).astype(np.int16)
    )
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(ref_recon))
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))


def test_specialized_kernel_matches_on_device():
    """The range-specialized kernel (the compiled-backend default since
    it runs ~10-14% faster at identical output) must pick byte-identical
    profiles.  Compiled backends only: the unrolled graph is
    pathologically slow to trace in interpret mode, so CPU runs check the
    fori twin (above) and this test runs in the TPU pass
    (BJXA_TEST_TPU=1), where both variants compile in seconds from the
    persistent cache."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("specialized kernel needs a compiled TPU backend")
    rng = np.random.default_rng(11)
    B, L = 4, 1024
    pcm = rng.integers(-32768, 32768, size=(B, 32, L)).astype(np.int32)
    state = rng.integers(-3000, 3000, size=(L, 2)).astype(np.int32)
    base = encode_search_pallas_core(
        jnp.asarray(pcm), jnp.asarray(state), bits=6,
        lane_tile=1024, block_tile=4,
    )
    spec = encode_search_pallas_core(
        jnp.asarray(pcm), jnp.asarray(state), bits=6,
        lane_tile=1024, block_tile=4, specialize=True,
    )
    for a, b, name in zip(base, spec, ("prof", "coded", "recon", "end")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)


def test_wrapper_padded_blocks_end_state_on_device():
    """The padding wrapper with a block count off the tile grid must
    recover the end state from the last REAL block (the padded zero
    blocks run the search too, but their state is discarded).  Compiled
    backends only, like the specialized-kernel test above."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("wrapper tracing is pathological in interpret mode")
    from bjxa_tpu.ops.pallas_encode import encode_search_pallas

    rng = np.random.default_rng(12)
    B, L = 5, 24  # pads blocks 5 -> 8 (block_tile 4) and lanes 24 -> 1024
    pcm = rng.integers(-32768, 32768, size=(B, 32, L)).astype(np.int32)
    state = rng.integers(-3000, 3000, size=(L, 2)).astype(np.int32)
    got = encode_search_pallas(
        jnp.asarray(pcm), jnp.asarray(state), bits=6
    )
    ref = encode_search_scan(jnp.asarray(pcm), jnp.asarray(state), bits=6)
    for a, b, name in zip(got, ref, ("prof", "coded", "recon", "end")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)
