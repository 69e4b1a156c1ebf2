"""Pallas kernel tests in interpreter mode (no TPU needed): bit-exactness
vs the scan path, padding handling, states-only variant."""

import numpy as np
import pytest

import jax.numpy as jnp

from bjxa_tpu.ops.filter import adpcm_filter_lanes, profile_gains
from bjxa_tpu.ops.pallas_filter import adpcm_filter_pallas
from bjxa_tpu.ops.tables import GAIN_K0, GAIN_K1


def make_case(rng, B, L, max_shift=12):
    samples = rng.integers(-(2**15), 2**15, size=(B, 32, L)).astype(np.int32)
    samples &= ~0xFF  # top-bits domain
    fac = rng.integers(0, 5, size=(B, L))
    shift = rng.integers(0, max_shift, size=(B, L)).astype(np.int32)
    k0 = GAIN_K0[fac].astype(np.int32)
    k1 = GAIN_K1[fac].astype(np.int32)
    state = rng.integers(-(2**15), 2**15, size=(L, 2)).astype(np.int32)
    return samples, k0, k1, shift, state


@pytest.mark.parametrize("B,L", [(4, 64)])
def test_pallas_matches_scan(B, L):
    rng = np.random.default_rng(B * L)
    samples, k0, k1, shift, state = make_case(rng, B, L)
    ranged = samples >> shift[:, None, :]
    ref_pcm, ref_end = adpcm_filter_lanes(
        jnp.asarray(ranged), jnp.asarray(k0), jnp.asarray(k1),
        jnp.asarray(state),
    )
    pcm, end = adpcm_filter_pallas(
        jnp.asarray(samples, jnp.int16),
        jnp.asarray(k0),
        jnp.asarray(k1),
        jnp.asarray(shift),
        jnp.asarray(state),
        lane_tile=64,
        block_tile=4,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pcm), np.asarray(ref_pcm))
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))


def test_pallas_states_only():
    rng = np.random.default_rng(5)
    B, L = 4, 64
    samples, k0, k1, shift, state = make_case(rng, B, L)
    ranged = samples >> shift[:, None, :]
    _, ref_end = adpcm_filter_lanes(
        jnp.asarray(ranged), jnp.asarray(k0), jnp.asarray(k1),
        jnp.asarray(state),
    )
    pcm, end = adpcm_filter_pallas(
        jnp.asarray(samples, jnp.int16),
        jnp.asarray(k0),
        jnp.asarray(k1),
        jnp.asarray(shift),
        jnp.asarray(state),
        lane_tile=64,
        block_tile=4,
        with_output=False,
        interpret=True,
    )
    assert pcm is None
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))


def test_pallas_saturation():
    """Sustained saturation (the golden saturation vector's regime)."""
    B, L = 4, 64
    samples = np.full((B, 32, L), 0x7F00, np.int32)
    samples[:, :, L // 2 :] = -0x8000  # negative rail
    k0 = np.full((B, L), 460, np.int32)
    k1 = np.full((B, L), -208, np.int32)
    shift = np.zeros((B, L), np.int32)
    state = np.zeros((L, 2), np.int32)
    ranged = samples >> shift[:, None, :]
    ref_pcm, ref_end = adpcm_filter_lanes(
        jnp.asarray(ranged), jnp.asarray(k0), jnp.asarray(k1),
        jnp.asarray(state),
    )
    pcm, end = adpcm_filter_pallas(
        jnp.asarray(samples, jnp.int16),
        jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(shift),
        jnp.asarray(state),
        lane_tile=64, block_tile=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pcm), np.asarray(ref_pcm))
    np.testing.assert_array_equal(np.asarray(end), np.asarray(ref_end))


def test_pallas_states_only_device():
    """decode_lanes_pallas(with_output=False) returns end states equal to
    the full pass (the state-propagation mode of the fixpoint decoder on
    the non-fused pallas path).  Compiled backends only."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a compiled TPU backend")
    from bjxa_tpu.ops.pallas_filter import decode_lanes_pallas

    rng = np.random.default_rng(5)
    B, L = 6, 8
    profiles = (rng.integers(0, 5, (B, L)) << 4 | rng.integers(0, 12, (B, L))).astype(np.int32)
    samples = rng.integers(-(2**15), 2**15, (B, 32, L)).astype(np.int32) & ~0xFF
    state = rng.integers(-2000, 2000, (L, 2)).astype(np.int32)
    full, full_end, _ = decode_lanes_pallas(
        jnp.asarray(profiles), jnp.asarray(samples), jnp.asarray(state)
    )
    none, end, _v = decode_lanes_pallas(
        jnp.asarray(profiles), jnp.asarray(samples), jnp.asarray(state),
        with_output=False,
    )
    assert none is None
    np.testing.assert_array_equal(np.asarray(end), np.asarray(full_end))
