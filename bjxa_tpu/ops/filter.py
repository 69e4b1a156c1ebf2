"""The two-tap ADPCM prediction filter as a lane-vectorized scan.

This is the sequential hot loop of the codec (reference:
``bjxa_decode_inflated``, ``src/libbjxa.c:533-578``).  The recurrence

    sample[n] = clamp_i16(ranged[n] + trunc(prev0*k0 + prev1*k1, /256))
    prev1, prev0 = prev0, sample[n]

is non-associative (int16 saturation + truncating division), so the
TPU-native formulation keeps the honest sample-order recurrence but runs it
simultaneously over a large *lane* axis — independent channel streams
(files x channels, or chunks of one stream for the fixed-point parallel
decoder in :mod:`bjxa_tpu.ops.decode`).  Each scan step is a handful of
elementwise VPU ops over ``[lanes]`` vectors; the per-block inner 32 steps
are unrolled so gain coefficients are loop-invariant within a step.

C integer semantics reproduced exactly:

* ``gain / 256`` truncates toward zero -> ``(g + ((g >> 31) & 255)) >> 8``
* ``value >> range`` is an arithmetic shift of the int16 value
* clamp saturates to [-32768, 32767] before state update
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from bjxa_tpu.ops.tables import (
    BLOCK_SAMPLES,
    GAIN_K0,
    GAIN_K1,
    INT16_MAX,
    INT16_MIN,
    NUM_FACTORS,
)


def trunc_div_256(g: jnp.ndarray) -> jnp.ndarray:
    """C-style ``g / 256`` (truncation toward zero) without a hardware div."""
    return (g + ((g >> 31) & 255)) >> 8


def profile_gains(profiles: jnp.ndarray):
    """Decode profile bytes into (k0, k1, shift, valid).

    ``profiles``: int32 ``[...]``.  Gathers are clipped so invalid factors
    (>= 5) still produce defined (garbage) output; ``valid`` lets the host
    raise the EPROTO-equivalent, mirroring ``src/libbjxa.c:550``.
    """
    factor = (profiles >> 4) & 0x0F
    shift = profiles & 0x0F
    valid = factor < NUM_FACTORS
    k0 = jnp.asarray(GAIN_K0)[jnp.minimum(factor, NUM_FACTORS - 1)]
    k1 = jnp.asarray(GAIN_K1)[jnp.minimum(factor, NUM_FACTORS - 1)]
    return k0.astype(jnp.int32), k1.astype(jnp.int32), shift, valid


def adpcm_filter_lanes(
    ranged: jnp.ndarray,
    k0: jnp.ndarray,
    k1: jnp.ndarray,
    state: jnp.ndarray,
    with_output: bool = True,
):
    """Run the prediction filter over every lane simultaneously.

    Args:
      ranged: ``int32[B, 32, L]`` — unpacked samples already shifted by the
        block range (i.e. the ``ranged`` operand of the recurrence).
      k0, k1: ``int32[B, L]`` — per-block gain coefficients per lane.
      state:  ``int32[L, 2]`` — (prev0, prev1) predictor state per lane.
      with_output: when False only the end state is computed (used by the
        state-propagation passes of the parallel decoder); the compiler
        then allocates no output buffer.

    Returns:
      ``(pcm int16[B, 32, L] | None, end_state int32[L, 2])``
    """
    p0 = state[:, 0]
    p1 = state[:, 1]

    def step(carry, xs):
        c0, c1 = carry
        r_blk, k0_b, k1_b = xs  # [32, L], [L], [L]
        outs = []
        for n in range(BLOCK_SAMPLES):
            gain = c0 * k0_b + c1 * k1_b
            s = r_blk[n] + trunc_div_256(gain)
            s = jnp.clip(s, INT16_MIN, INT16_MAX)
            c1 = c0
            c0 = s
            if with_output:
                outs.append(s)
        y = (
            jnp.stack(outs, axis=0).astype(jnp.int16)
            if with_output
            else None
        )
        return (c0, c1), y

    (p0, p1), pcm = lax.scan(step, (p0, p1), (ranged, k0, k1))
    end_state = jnp.stack([p0, p1], axis=-1)
    return pcm, end_state


def _pallas_default() -> bool:
    """Use the Pallas kernel on TPU-like backends unless overridden."""
    import os

    env = os.environ.get("BJXA_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing only
        return False


def _fused_default() -> bool:
    """Use the fused raw-bytes Pallas decode kernel on TPU-like backends.

    With the 32-way sublane split matching uint8's native (32, 128) vreg
    tiling (``pallas_decode.pick_tiles``), the fused kernel decodes ~63
    Gsamp/s on v5e vs ~17 Gsamp/s for the two-stage unpack+filter pipeline
    — provided callers stage blocks lane-major on the host (a device uint8
    transpose costs more than the kernel itself).  ``BJXA_FUSED=0``
    disables; ``BJXA_FUSED=1`` forces it on regardless of backend.
    """
    import os

    env = os.environ.get("BJXA_FUSED")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing only
        return False


def decode_lanes(
    profiles: jnp.ndarray,
    samples: jnp.ndarray,
    state: jnp.ndarray,
    with_output: bool = True,
    use_pallas: bool | None = None,
):
    """Full per-lane block decode: profile decode, range shift, filter.

    Args:
      profiles: ``int32[B, L]`` — profile byte per block per lane.
      samples:  ``int32[B, 32, L]`` — unpacked top-bits sample values.
      state:    ``int32[L, 2]``.
      use_pallas: force the Pallas kernel on/off; default auto (TPU: on).

    Returns ``(pcm int16[B, 32, L] | None, end_state int32[L, 2],
    valid bool[B, L])``.
    """
    if use_pallas is None:
        use_pallas = _pallas_default()
    if use_pallas:
        from bjxa_tpu.ops.pallas_filter import decode_lanes_pallas

        return decode_lanes_pallas(
            profiles, samples, state, with_output=with_output
        )
    k0, k1, shift, valid = profile_gains(profiles)
    # keep the ranged array in the narrowest dtype the domain allows:
    # int16 when samples arrive as int16 (arithmetic shift stays in range)
    if samples.dtype == jnp.int16:
        ranged = samples >> shift.astype(jnp.int16)[:, None, :]
    else:
        ranged = samples >> shift[:, None, :]
    pcm, end_state = adpcm_filter_lanes(
        ranged, k0, k1, state, with_output=with_output
    )
    return pcm, end_state, valid
