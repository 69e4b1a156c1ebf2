"""Pallas TPU kernel for the ADPCM prediction filter.

The XLA ``lax.scan`` formulation (:mod:`bjxa_tpu.ops.filter`) pays loop
overhead per 32-sample block step that dwarfs the ~7 VPU ops each sample
needs; this kernel runs the recurrence as straight-line unrolled code over
VMEM tiles instead:

* samples stream in and out as **int16** (the format's native domain), so
  HBM traffic is 2B in + 2B out per sample; the range shift happens
  in-kernel, so the XLA prep only unpacks bytes to int16;
* lanes are laid out over the two minor dims ``(16, LANE_TILE/16)`` —
  int16-native vreg tiling — and every elementwise op maps to whole vregs;
* the grid is ``(lane_tiles, block_tiles)`` with the block dimension
  iterating fastest; predictor state lives in VMEM scratch that persists
  across block tiles (TPU grids execute sequentially), carrying state
  exactly like the reference's in-struct ``prev[2]``
  (``src/libbjxa.c:556-575``);
* per sample: two multiplies, truncating /256, add, clamp — int32 compute,
  bit-exact with the scan path and the C reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bjxa_tpu.ops.tables import BLOCK_SAMPLES, INT16_MAX, INT16_MIN

SUBLANES = 16  # int16-native sublane count


def _filter_kernel(samples_ref, k0_ref, k1_ref, shift_ref, state_ref,
                   out_ref, end_ref, st_ref, *, block_tile: int,
                   with_output: bool = True):
    b = pl.program_id(1)
    num_b = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        st_ref[...] = state_ref[...]

    p0 = st_ref[0]
    p1 = st_ref[1]
    for j in range(block_tile):
        k0 = k0_ref[j]
        k1 = k1_ref[j]
        shift = shift_ref[j]
        for n in range(BLOCK_SAMPLES):
            ranged = samples_ref[j, n].astype(jnp.int32) >> shift
            g = p0 * k0 + p1 * k1
            s = ranged + ((g + ((g >> 31) & 255)) >> 8)
            s = jnp.clip(s, INT16_MIN, INT16_MAX)
            if with_output:
                out_ref[j, n] = s.astype(jnp.int16)
            p1 = p0
            p0 = s
    st_ref[0] = p0
    st_ref[1] = p1

    @pl.when(b == num_b - 1)
    def _():
        end_ref[...] = st_ref[...]


def _states_kernel(samples_ref, k0_ref, k1_ref, shift_ref, state_ref,
                   end_ref, st_ref, *, block_tile: int):
    _filter_kernel(
        samples_ref, k0_ref, k1_ref, shift_ref, state_ref, None, end_ref,
        st_ref, block_tile=block_tile, with_output=False,
    )


@partial(
    jax.jit,
    static_argnames=("lane_tile", "block_tile", "with_output", "interpret"),
)
def adpcm_filter_pallas(
    samples: jnp.ndarray,
    k0: jnp.ndarray,
    k1: jnp.ndarray,
    shift: jnp.ndarray,
    state: jnp.ndarray,
    *,
    lane_tile: int = 2048,
    block_tile: int = 8,
    with_output: bool = True,
    interpret: bool = False,
):
    """Run the prediction filter over all lanes with the Pallas kernel.

    Args:
      samples: ``int16[B, 32, L]`` — unpacked top-bits sample values
        (NOT yet range-shifted; the shift happens in-kernel).
      k0, k1:  ``int32[B, L]`` — per-block gains per lane.
      shift:   ``int32[B, L]`` — per-block range per lane.
      state:   ``int32[L, 2]`` — (prev0, prev1) per lane.

    L must be a multiple of ``lane_tile`` and B of ``block_tile`` (callers
    pad with cheap dummy lanes/blocks).

    Returns ``(pcm int16[B, 32, L], end_state int32[L, 2])``, bit-exact
    with :func:`bjxa_tpu.ops.filter.adpcm_filter_lanes`.
    """
    B, ns, L = samples.shape
    assert ns == BLOCK_SAMPLES
    assert L % lane_tile == 0 and B % block_tile == 0, (L, B)
    ln = lane_tile // SUBLANES
    LN = L // SUBLANES
    grid = (L // lane_tile, B // block_tile)

    # lane-minor views [.., 16, L/16]; the lane<->(sublane, lane) bijection
    # is consistent across every operand so it never materializes.
    s4 = samples.astype(jnp.int16).reshape(B, BLOCK_SAMPLES, SUBLANES, LN)
    k04 = k0.reshape(B, SUBLANES, LN)
    k14 = k1.reshape(B, SUBLANES, LN)
    sh4 = shift.reshape(B, SUBLANES, LN)
    st4 = state.transpose(1, 0).reshape(2, SUBLANES, LN)

    in_specs = [
        pl.BlockSpec(
            (block_tile, BLOCK_SAMPLES, SUBLANES, ln),
            lambda l, b: (b, 0, 0, l),
        ),
        pl.BlockSpec((block_tile, SUBLANES, ln), lambda l, b: (b, 0, l)),
        pl.BlockSpec((block_tile, SUBLANES, ln), lambda l, b: (b, 0, l)),
        pl.BlockSpec((block_tile, SUBLANES, ln), lambda l, b: (b, 0, l)),
        pl.BlockSpec((2, SUBLANES, ln), lambda l, b: (0, 0, l)),
    ]
    end_spec = pl.BlockSpec((2, SUBLANES, ln), lambda l, b: (0, 0, l))
    end_shape = jax.ShapeDtypeStruct((2, SUBLANES, LN), jnp.int32)
    params = dict(
        grid=grid,
        in_specs=in_specs,
        scratch_shapes=[pltpu.VMEM((2, SUBLANES, ln), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )

    if with_output:
        out, end = pl.pallas_call(
            partial(_filter_kernel, block_tile=block_tile),
            out_specs=[
                pl.BlockSpec(
                    (block_tile, BLOCK_SAMPLES, SUBLANES, ln),
                    lambda l, b: (b, 0, 0, l),
                ),
                end_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (B, BLOCK_SAMPLES, SUBLANES, LN), jnp.int16
                ),
                end_shape,
            ],
            **params,
        )(s4, k04, k14, sh4, st4)
        pcm = out.reshape(B, BLOCK_SAMPLES, L)
    else:
        end = pl.pallas_call(
            partial(_states_kernel, block_tile=block_tile),
            out_specs=end_spec,
            out_shape=end_shape,
            **params,
        )(s4, k04, k14, sh4, st4)
        pcm = None

    end_state = end.reshape(2, L).transpose(1, 0)
    return pcm, end_state


def decode_lanes_pallas(
    profiles,
    samples,
    state,
    with_output: bool = True,
    interpret: bool = False,
):
    """Drop-in twin of :func:`bjxa_tpu.ops.filter.decode_lanes` running the
    Pallas kernel, with transparent padding to the lane/block tile grid.

    Args/returns match ``decode_lanes``: ``(pcm int16[B,32,L] | None,
    end int32[L,2], valid bool[B,L])``.  Padded dummy lanes/blocks are
    trimmed; padded *blocks* would corrupt per-lane end state, so the end
    state is recovered from the last real samples when with_output, and the
    block count is left unpadded (callers' B is padded only when needed).
    """
    from bjxa_tpu.ops.filter import profile_gains

    B, ns, L = samples.shape
    lane_tile = 2048  # (16, 128) int16 vregs — Mosaic's native tiling
    block_tile = 8

    pad_l = (-L) % lane_tile
    pad_b = (-B) % block_tile
    k0, k1, shift, valid = profile_gains(profiles)
    s16 = samples.astype(jnp.int16)
    st = state
    if pad_l or pad_b:
        s16 = jnp.pad(s16, ((0, pad_b), (0, 0), (0, pad_l)))
        k0 = jnp.pad(k0, ((0, pad_b), (0, pad_l)))
        k1 = jnp.pad(k1, ((0, pad_b), (0, pad_l)))
        shift = jnp.pad(shift, ((0, pad_b), (0, pad_l)))
        st = jnp.pad(state, ((0, pad_l), (0, 0)))

    pcm, end = adpcm_filter_pallas(
        s16,
        k0,
        k1,
        shift,
        st,
        lane_tile=lane_tile,
        block_tile=block_tile,
        with_output=with_output or pad_b > 0,
        interpret=interpret,
    )
    end = end[:L]
    if pcm is not None:
        pcm = pcm[:B, :, :L]
        if pad_b:
            # padded trailing blocks dragged lane state to 0; true end
            # state is the last two real samples
            end = jnp.stack(
                [pcm[B - 1, -1, :], pcm[B - 1, -2, :]], axis=-1
            ).astype(jnp.int32)
    if not with_output:
        pcm = None
    return pcm, end, valid
