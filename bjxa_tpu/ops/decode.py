"""Jitted XA decode pipelines.

Three device pipelines over the shared lane-vectorized filter
(:mod:`bjxa_tpu.ops.filter`):

* :func:`decode_arrays` — one file, lanes = channels.  The honest
  sequential-over-blocks scan; correctness baseline.
* :func:`decode_arrays_fixpoint` — one file, lanes = channels x chunks.
  Exact intra-file parallelism: the block range is split into K chunks that
  all decode in parallel from guessed boundary predictor states, iterated to
  a fixed point.  Because chunk 0 is anchored at the true header state and
  each iteration propagates exact end states one chunk forward, the fixed
  point is reached in at most K iterations and is *bit-exact*; typical audio
  converges in 2-4 iterations because the filter poles lie inside the unit
  circle (SURVEY §2.5, §7 "hard parts").
* :func:`decode_batch` — many equal-shape channel streams, lanes = N x C.
  The corpus/throughput path.

Hosts call the ``decode_bytes`` convenience which picks a pipeline, checks
profile validity (EPROTO taxonomy) and trims the padded tail.

Reference semantic anchors: block loop ``src/libbjxa.c:602-661``; stereo
blocks are channel-major within an effective block and PCM is interleaved at
stride ``channels``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bjxa_tpu.errors import BjxaProtocolError
from bjxa_tpu.format.xa import XAFormat
from bjxa_tpu.ops.inflate import inflate_blocks, inflate_lanes
from bjxa_tpu.ops.filter import decode_lanes
from bjxa_tpu.ops.tables import BLOCK_SAMPLES


# --------------------------------------------------------------------------
# single file, sequential over blocks (lanes = channels)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("bits",))
def decode_arrays(blocks: jnp.ndarray, state: jnp.ndarray, *, bits: int):
    """Decode one file's blocks; lanes are its channels.

    Args:
      blocks: ``uint8[C, B, block_size]`` raw XA blocks per channel.
      state:  ``int32[C, 2]`` initial predictor state (header befL/befR).

    Returns ``(pcm int16[B*32, C], end_state int32[C, 2], valid bool[B, C])``.
    """
    profiles, samples = inflate_blocks(blocks, bits)  # [C,B], [C,B,32]
    profiles = profiles.transpose(1, 0)  # [B, C]
    samples = samples.transpose(1, 2, 0)  # [B, 32, C]
    pcm, end_state, valid = decode_lanes(profiles, samples, state)
    frames = pcm.reshape(-1, pcm.shape[-1])  # [B*32, C]
    return frames, end_state, valid


# --------------------------------------------------------------------------
# single file, chunk-parallel fixed point (lanes = chunks x channels)
# --------------------------------------------------------------------------


def _fixpoint_states(run, anchor, K: int, C: int, max_iters: int):
    """Iterate chunk boundary states to the exact fixed point.

    ``run(states_flat int32[K*C, 2], with_output) -> (pcm|None,
    end int32[K*C, 2])`` decodes every chunk lane from the given input
    states.  Chunk 0 is anchored at ``anchor`` (the true entry state), so
    after i iterations chunks 0..i hold exact states; the loop exits as
    soon as nothing changes (integer equality — exactness is certain, not
    probabilistic).  Returns ``(converged [K, C, 2], iterations)``.
    """

    def propagate(states):
        _, end = run(states.reshape(K * C, 2), False)
        end = end.reshape(K, C, 2)
        return jnp.concatenate([anchor[None], end[:-1]], axis=0)

    def cond(carry):
        states, prev, it = carry
        return jnp.logical_and(it < max_iters, jnp.any(states != prev))

    def body(carry):
        states, _, it = carry
        return propagate(states), states, it + 1

    init = jnp.zeros((K, C, 2), jnp.int32).at[0].set(anchor)
    first = propagate(init)
    states, _, iters = lax.while_loop(
        cond, body, (first, init, jnp.int32(1))
    )
    return states, iters


def _unscramble_chunks(pcm_l, B: int, K: int, C: int):
    """[Bc, 32, K*C] chunk-lane output -> [B*32, C] frames (trim pad)."""
    Bc = pcm_l.shape[0]
    return (
        pcm_l.reshape(Bc, BLOCK_SAMPLES, K, C)
        .transpose(2, 0, 1, 3)
        .reshape(K * Bc * BLOCK_SAMPLES, C)[: B * BLOCK_SAMPLES]
    )


def _end_from_frames(frames, B: int):
    """True end state after the last real block (padded dummy blocks drag
    lane state to zero, so recover it from the decoded samples)."""
    last = B * BLOCK_SAMPLES
    return jnp.stack([frames[last - 1], frames[last - 2]], axis=-1).astype(
        jnp.int32
    )


def fixpoint_core(
    profiles: jnp.ndarray,
    samples: jnp.ndarray,
    state: jnp.ndarray,
    num_chunks: int,
):
    """Traceable chunk-parallel fixed-point decode core (scan/Pallas filter
    over unpacked samples).

    Args:
      profiles: ``int32[C, B]``; samples: unpacked ``[C, B, 32]``;
      state: ``int32[C, 2]`` — the *true* entry state of block 0 (for the
        device-sharded decoder this is the dynamically guessed boundary
        state, which is exactly what makes the outer fixed point work).

    Returns ``(pcm int16[B*32, C], end_state int32[C, 2], valid bool[B, C],
    iterations int32)``.  Usable under jit directly or inside shard_map.
    """
    C, B = profiles.shape
    K = num_chunks
    Bc = -(-B // K)  # blocks per chunk, ceil
    pad = K * Bc - B

    # Pad the tail with valid dummy blocks (profile 0, samples 0).
    profiles = jnp.pad(profiles, ((0, 0), (0, pad)))
    samples = jnp.pad(samples, ((0, 0), (0, pad), (0, 0)))

    # Lane layout: lane l = k * C + c  (chunk-major, channel-minor).
    # [C, K*Bc] -> [C, K, Bc] -> [Bc, K, C] -> [Bc, K*C]
    prof_l = profiles.reshape(C, K, Bc).transpose(2, 1, 0).reshape(Bc, K * C)
    samp_l = (
        samples.reshape(C, K, Bc, BLOCK_SAMPLES)
        .transpose(2, 3, 1, 0)
        .reshape(Bc, BLOCK_SAMPLES, K * C)
    )

    anchor = state.astype(jnp.int32)  # [C, 2] — true state of chunk 0

    def run(states_flat, with_output):
        pcm, end, _valid = decode_lanes(
            prof_l, samp_l, states_flat, with_output=with_output
        )
        return pcm, end

    states, iters = _fixpoint_states(run, anchor, K, C, max_iters=K)

    # Final full pass with outputs from the converged (exact) states.
    pcm_l, _end_l, valid_l = decode_lanes(
        prof_l, samp_l, states.reshape(K * C, 2)
    )
    frames = _unscramble_chunks(pcm_l, B, K, C)
    valid = (
        valid_l.reshape(Bc, K, C).transpose(1, 0, 2).reshape(K * Bc, C)[:B]
    )
    return frames, _end_from_frames(frames, B), valid, iters


def _lanes_run(blocks_t: jnp.ndarray, bits: int, fused: bool):
    """Build the ``run(states_flat, with_output) -> (pcm, end)`` closure
    over lane-major raw blocks: the fused Pallas kernel (TPU) or the XLA
    lane-major unpack + scan pipeline (any backend)."""
    if fused:
        from bjxa_tpu.ops.pallas_decode import fused_decode_padded

        def run(states_flat, with_output):
            return fused_decode_padded(
                blocks_t, states_flat, bits=bits, with_output=with_output
            )
    else:
        profiles, samples = inflate_lanes(blocks_t, bits)

        def run(states_flat, with_output):
            pcm, end, _valid = decode_lanes(
                profiles, samples, states_flat, with_output=with_output
            )
            return pcm, end

    return run


def fixpoint_lanes_core(
    blocks_t: jnp.ndarray,
    state: jnp.ndarray,
    num_chunks: int,
    channels: int,
    b_total: int,
    *,
    bits: int,
    fused: bool,
):
    """Chunk-parallel fixed-point decode over lane-major raw blocks.

    The shared core behind every intra-stream parallel decode path.

    Args:
      blocks_t: ``uint8[Bc, S, K*C]`` — raw blocks, lane-minor, lane
        ``l = k*C + c`` (chunk-major, channel-minor); trailing lanes beyond
        ``b_total`` blocks hold valid dummy pad (profile 0, zero samples).
      state:    ``int32[C, 2]`` — true entry state of chunk 0.
      b_total:  real (pre-chunk-padding) block count, ``<= K*Bc``.
      fused:    route through the fused Pallas kernel (TPU) or the XLA
        lane-major unpack + scan pipeline (any backend).

    Returns ``(pcm int16[b_total*32, C], end int32[C, 2],
    valid bool[b_total, C], iterations int32)``.
    """
    Bc, S, KC = blocks_t.shape
    K, C = num_chunks, channels
    assert KC == K * C, (KC, K, C)
    anchor = state.astype(jnp.int32)
    run = _lanes_run(blocks_t, bits, fused)
    states, iters = _fixpoint_states(run, anchor, K, C, max_iters=K)
    pcm_l, _ = run(states.reshape(K * C, 2), True)
    frames = _unscramble_chunks(pcm_l, b_total, K, C)
    valid_l = (blocks_t[:, 0, :] >> 4) < 5  # [Bc, K*C]
    valid = (
        valid_l.reshape(Bc, K, C)
        .transpose(1, 0, 2)
        .reshape(K * Bc, C)[:b_total]
    )
    return frames, _end_from_frames(frames, b_total), valid, iters


def fixpoint_lanes_end_state(
    blocks_t: jnp.ndarray,
    state: jnp.ndarray,
    num_chunks: int,
    channels: int,
    *,
    bits: int,
    fused: bool,
):
    """States-only twin of :func:`fixpoint_lanes_core`: returns just the
    exact end state ``int32[C, 2]`` after the last block (no sample output
    materialized).  The chunk grid must end exactly at the stream end
    (callers pad with valid dummy blocks and account for them).
    """
    Bc, S, KC = blocks_t.shape
    K, C = num_chunks, channels
    assert KC == K * C, (KC, K, C)
    anchor = state.astype(jnp.int32)
    run = _lanes_run(blocks_t, bits, fused)
    states, _ = _fixpoint_states(run, anchor, K, C, max_iters=K)
    _, end = run(states.reshape(K * C, 2), False)
    return end.reshape(K, C, 2)[-1]


def fixpoint_core_fused(
    blocks: jnp.ndarray,
    state: jnp.ndarray,
    num_chunks: int,
    *,
    bits: int,
):
    """Fused-kernel twin of :func:`fixpoint_core` operating on raw bytes.

    Args:
      blocks: ``uint8[C, B, block_size]`` raw channel blocks.
      state:  ``int32[C, 2]``.

    Same returns.  Prefer :func:`fixpoint_lanes_core` with host-staged
    lane-major input — the uint8 transpose here runs on device, which is
    the slowest possible layout pass on TPU.
    """
    C, B, S = blocks.shape
    K = num_chunks
    Bc = -(-B // K)
    pad = K * Bc - B
    # all-zero dummy blocks are valid (profile 0) and get trimmed
    blocks = jnp.pad(blocks, ((0, 0), (0, pad), (0, 0)))
    # [C, K, Bc, S] -> [Bc, S, K, C] -> [Bc, S, K*C]
    blocks_t = (
        blocks.reshape(C, K, Bc, S).transpose(2, 3, 1, 0).reshape(Bc, S, K * C)
    )
    return fixpoint_lanes_core(
        blocks_t, state, K, C, B, bits=bits, fused=True
    )


@partial(jax.jit, static_argnames=("bits", "num_chunks"))
def decode_arrays_fixpoint(
    blocks: jnp.ndarray,
    state: jnp.ndarray,
    *,
    bits: int,
    num_chunks: int,
):
    """Exact chunk-parallel decode of one file via fixed-point iteration.

    Channel-major convenience over :func:`fixpoint_lanes_core` /
    :func:`fixpoint_core` (hosts that can stage lane-major should call
    :func:`decode_fixpoint_lanes` instead — it avoids device transposes).

    Args:
      blocks: ``uint8[C, B, block_size]``; B need not divide num_chunks.
      state:  ``int32[C, 2]``.

    Returns ``(pcm int16[B*32, C], end_state int32[C, 2], valid bool[B, C],
    iterations int32)``.
    """
    from bjxa_tpu.ops.filter import _fused_default

    if _fused_default():
        return fixpoint_core_fused(blocks, state, num_chunks, bits=bits)
    profiles, samples = inflate_blocks(blocks, bits)  # [C,B], [C,B,32]
    return fixpoint_core(profiles, samples, state, num_chunks)


@partial(
    jax.jit,
    static_argnames=("bits", "num_chunks", "channels", "b_total"),
)
def decode_fixpoint_lanes(
    blocks_t: jnp.ndarray,
    state: jnp.ndarray,
    *,
    bits: int,
    num_chunks: int,
    channels: int,
    b_total: int,
):
    """Jitted chunk-parallel decode of host-staged lane-major blocks.

    The single-stream fast path: the host slices the XA payload straight
    into the ``uint8[Bc, S, K*C]`` chunk-lane layout (one numpy copy it
    would pay for any layout), so the device runs zero byte transposes —
    on TPU the fused kernel reads raw bytes at native (32, 128) uint8
    tiling and writes filtered PCM.

    Returns ``(pcm int16[b_total*32, C], end int32[C, 2],
    valid bool[b_total, C], iterations int32)``.
    """
    from bjxa_tpu.ops.filter import _fused_default

    return fixpoint_lanes_core(
        blocks_t,
        state,
        num_chunks,
        channels,
        b_total,
        bits=bits,
        fused=_fused_default(),
    )


# --------------------------------------------------------------------------
# many equal-shape channel streams (lanes = N x C)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("bits",))
def decode_batch(blocks: jnp.ndarray, state: jnp.ndarray, *, bits: int):
    """Decode a batch of equal-shape files; lanes = files x channels.

    Channel-major convenience (hosts that can stage lane-major should call
    :func:`decode_batch_lanes` — it avoids the int16 device transposes).

    Args:
      blocks: ``uint8[N, C, B, block_size]``.
      state:  ``int32[N, C, 2]``.

    Returns ``(pcm int16[N, B*32, C], end_state int32[N, C, 2],
    valid bool[B, N, C])``.
    """
    N, C, B, S = blocks.shape
    profiles, samples = inflate_blocks(blocks, bits)
    prof_l = profiles.transpose(2, 0, 1).reshape(B, N * C)
    samp_l = samples.transpose(2, 3, 0, 1).reshape(B, BLOCK_SAMPLES, N * C)
    pcm, end_state, valid_l = decode_lanes(
        prof_l, samp_l, state.reshape(N * C, 2)
    )
    valid = valid_l.reshape(B, N, C)
    frames = (
        pcm.reshape(B, BLOCK_SAMPLES, N, C)
        .transpose(2, 0, 1, 3)
        .reshape(N, B * BLOCK_SAMPLES, C)
    )
    return frames, end_state.reshape(N, C, 2), valid


@partial(jax.jit, static_argnames=("bits",))
def decode_batch_lanes(blocks_t: jnp.ndarray, state: jnp.ndarray, *, bits: int):
    """Decode lane-major raw blocks: the corpus/throughput fast path.

    Lanes are independent channel streams (files x channels, any order the
    caller chooses) — the host stages ``uint8[B, S, L]`` directly from file
    bytes, and PCM comes back in the same lane order for the host
    serializer to de-interleave per file while writing WAVs.

    Args:
      blocks_t: ``uint8[B, S, L]`` raw blocks, lane-minor.
      state:    ``int32[L, 2]``.

    Returns ``(pcm int16[B, 32, L], end int32[L, 2], valid bool[B, L])``.
    """
    from bjxa_tpu.ops.filter import _fused_default

    valid = (blocks_t[:, 0, :] >> 4) < 5
    if _fused_default():
        from bjxa_tpu.ops.pallas_decode import fused_decode_padded

        pcm, end = fused_decode_padded(blocks_t, state, bits=bits)
    else:
        profiles, samples = inflate_lanes(blocks_t, bits)
        pcm, end, _v = decode_lanes(profiles, samples, state)
    return pcm, end, valid


@partial(jax.jit, static_argnames=("bits",))
def pack_words_from_lanes(blocks_t: jnp.ndarray, *, bits: int):
    """Pack lane-major raw blocks into the packed-words device layout.

    ``uint8[B, S, L] -> (prof uint8[B, L], words int32[B, bits, L])`` where
    word ``w`` holds payload bytes ``4w..4w+3`` little-endian (the payload
    is ``4*bits`` bytes, so there are exactly ``bits`` words per block).
    Device-side convenience for callers that cannot stage words host-side;
    the hot paths stage words directly (one numpy copy, same cost as any
    layout — see :func:`words_from_blocks_host`).
    """
    B, S, L = blocks_t.shape
    assert S == 4 * bits + 1, (S, bits)
    pay = blocks_t[:, 1:, :].astype(jnp.uint32).reshape(B, bits, 4, L)
    w = (pay[:, :, 0] | (pay[:, :, 1] << 8) | (pay[:, :, 2] << 16)
         | (pay[:, :, 3] << 24))
    return blocks_t[:, 0, :], lax.bitcast_convert_type(w, jnp.int32)


@partial(jax.jit, static_argnames=("bits",))
def words_to_blocks(prof: jnp.ndarray, words: jnp.ndarray, *, bits: int):
    """Inverse of :func:`pack_words_from_lanes`: reassemble
    ``uint8[B, S, L]`` lane-major raw blocks from the words layout (used by
    the non-fused fallback pipelines)."""
    B, W, L = words.shape
    assert W == bits, (W, bits)
    wu = lax.bitcast_convert_type(words, jnp.uint32)
    planes = [((wu >> (8 * q)) & 0xFF).astype(jnp.uint8) for q in range(4)]
    payload = jnp.stack(planes, axis=2).reshape(B, 4 * W, L)
    return jnp.concatenate([prof[:, None, :], payload], axis=1)


def trim_padded_lanes(pcm: jnp.ndarray, B: int, L: int,
                      *, waste_factor: int = 2) -> jnp.ndarray:
    """Device-side trim of kernel-padded PCM when padding dominates.

    The fused kernel returns PCM in its padded native split
    ``int16[Bp, 32, sub, LNp]``; transferring that to the host moves
    ``Bp*sub*LNp / (B*L)`` times the real bytes.  When that ratio exceeds
    ``waste_factor`` (small corpus batches padded up to a full lane tile),
    a flat reshape (a free view — the 4-D split is contiguous) plus slice
    copies only the real bytes on device, far cheaper than shipping pad
    over PCIe (or a slow tunnel).  Near full tiles the slice would
    relayout-copy essentially the whole output for no transfer saving, so
    the padded layout passes through and hosts trim after transfer with
    the usual ``reshape(Bp, 32, -1)[:B, :, :L]`` recipe (a numpy view).
    """
    if pcm.ndim != 4:
        return pcm  # scan fallback: already flat [B, 32, L]
    Bp, ns, sub, LNp = pcm.shape
    if Bp * sub * LNp <= waste_factor * B * L:
        return pcm
    return pcm.reshape(Bp, ns, sub * LNp)[:B, :, :L]


def packed_layout(blocks: int, lanes: int, bits: int):
    """Element offsets of the single-buffer batch staging layout.

    A corpus batch ships host->device as ONE int32 buffer concatenating
    the three logical inputs of :func:`decode_batch_words`:

    ``[words int32[B, bits, L] | prof bytes packed 4/int32 | state int32[L, 2]]``

    Returns ``(n_words, n_prof_words, n_state)`` element counts.  One
    transfer instead of three matters on thin host<->device links: each
    transfer and each dispatch costs a fixed round trip (~24 ms through
    this environment's tunnel, measured by ``tools/link_probe.py``), so a
    link-bound corpus engine pays 3x the fixed cost for split inputs.
    """
    n_words = blocks * bits * lanes
    n_prof = -(-(blocks * lanes) // 4)
    return n_words, n_prof, lanes * 2


@partial(jax.jit, static_argnames=("bits", "blocks", "lanes"))
def decode_batch_packed(buf: jnp.ndarray, *, bits: int, blocks: int,
                        lanes: int):
    """Decode one corpus batch from a single packed int32 staging buffer.

    Single-transfer twin of :func:`decode_batch_words` (layout:
    :func:`packed_layout`).  Returns the PCM only: profile validity is the
    host's job (it staged the profile bytes, so ``(prof >> 4) < 5`` costs
    it nothing), and the end state is unused by corpus decode — returning
    them would add device->host transfers to a link-bound pipeline.

    The PCM is trimmed to the real ``blocks x 32 x lanes`` extent on
    device (``waste_factor=1``) and returned FLAT (1-D int16): on a
    link-bound engine, shipping kernel lane/block padding costs far more
    than the device-side relayout copy, and a small-minor-dim 3-D result
    transfers at ~1/3 of link speed (the runtime pads the trailing dim to
    the 128-lane tile during D2H) while a flat vector moves at full rate
    — measured 12 vs 32 MB/s on this tunnel.  Hosts recover the layout
    with a free ``reshape(blocks, 32, lanes)``.
    """
    B, W, L = blocks, bits, lanes
    nw, npr, _nst = packed_layout(B, L, bits)
    words = buf[:nw].reshape(B, W, L)
    pw = lax.bitcast_convert_type(buf[nw : nw + npr], jnp.uint32)
    pb = jnp.stack([(pw >> (8 * q)) & 0xFF for q in range(4)], axis=-1)
    prof = pb.reshape(-1)[: B * L].astype(jnp.uint8).reshape(B, L)
    state = buf[nw + npr :].reshape(L, 2)
    from bjxa_tpu.ops.filter import _fused_default

    if _fused_default():
        from bjxa_tpu.ops.pallas_decode import fused_decode_words_padded

        pcm, _end = fused_decode_words_padded(prof, words, state, bits=bits)
        pcm = trim_padded_lanes(pcm, B, L, waste_factor=1)
    else:
        blocks_t = words_to_blocks(prof, words, bits=bits)
        profiles, samples = inflate_lanes(blocks_t, bits)
        pcm, _end, _v = decode_lanes(profiles, samples, state)
    return pcm.reshape(-1)


@partial(jax.jit, static_argnames=("bits",))
def decode_batch_words(prof: jnp.ndarray, words: jnp.ndarray,
                       state: jnp.ndarray, *, bits: int):
    """Decode packed-words lane-major blocks: the peak-throughput path.

    Same lane semantics as :func:`decode_batch_lanes`, but the payload
    arrives as packed little-endian int32 words and the PCM is returned in
    the kernel-native lane split — the two measured wins over the uint8
    path on v5e: int32 tile loads replace per-sample uint8 loads+converts
    (1.6x) and the device-side ``[B,32,sub,LN] -> [B,32,L]`` relayout copy
    of the whole output disappears (1.9x); together ~3x end to end.

    Args:
      prof:  ``uint8[B, L]``; words: ``int32[B, bits, L]`` (see
        :func:`pack_words_from_lanes`); state: ``int32[L, 2]``.

    Returns ``(pcm, end int32[L, 2], valid bool[B, L])`` where ``pcm`` is
    ``int16[B, 32, *lane_dims]`` with lane_dims backend-dependent (4-D
    padded split on the fused TPU path — unless padding dominated, see
    :func:`trim_padded_lanes` — flat ``[B, 32, L]`` otherwise).  Hosts
    recover lanes uniformly with
    ``np.asarray(pcm).reshape(Bp, 32, -1)[:B, :, :L]``.
    """
    from bjxa_tpu.ops.filter import _fused_default

    valid = (prof >> 4) < 5
    if _fused_default():
        from bjxa_tpu.ops.pallas_decode import fused_decode_words_padded

        pcm, end = fused_decode_words_padded(prof, words, state, bits=bits)
        pcm = trim_padded_lanes(pcm, prof.shape[0], prof.shape[1])
    else:
        blocks_t = words_to_blocks(prof, words, bits=bits)
        profiles, samples = inflate_lanes(blocks_t, bits)
        pcm, end, _v = decode_lanes(profiles, samples, state)
    return pcm, end, valid


# --------------------------------------------------------------------------
# host-facing conveniences
# --------------------------------------------------------------------------


def blocks_from_bytes(data: bytes | memoryview, fmt: XAFormat) -> np.ndarray:
    """Slice an XA payload into ``uint8[C, B, block_size]`` (channel-major).

    Stereo files store the left-channel block before the right-channel block
    inside each effective block (``src/libbjxa.c:633-646``).
    """
    need = fmt.blocks * fmt.block_size_xa
    raw = np.frombuffer(data, dtype=np.uint8, count=need)
    return np.ascontiguousarray(
        raw.reshape(fmt.blocks, fmt.channels, fmt.block_size).transpose(
            1, 0, 2
        )
    )


def pad_bucket(nblocks: int, granularity: int = 256) -> int:
    """Round a block count up to a compile-cache-friendly bucket.

    Distinct padded shapes each cost a full XLA/Mosaic compile (minutes for
    large programs through a remote-compile service), so buckets grow
    geometrically: round up to a 4-bit mantissa times a power of two
    (<= 1/8 pad waste — and pad blocks are profile-0 dummies, nearly free
    to decode), then to the linear ``granularity``.  For small counts this
    coincides with plain ``granularity`` rounding; a corpus of arbitrary
    file lengths compiles O(log) programs instead of O(lengths).
    """
    B = nblocks
    e = max(0, B.bit_length() - 4)
    Bp = (-(-B >> e)) << e
    return -(-Bp // granularity) * granularity


def chunk_lanes_from_bytes(
    payload: bytes | memoryview,
    fmt: XAFormat,
    num_chunks: int,
    pad_blocks: int,
) -> np.ndarray:
    """Slice an XA payload straight into the chunk-lane device layout.

    Returns ``uint8[Bc, S, K*C]`` with lane ``l = k*C + c`` — the layout
    :func:`decode_fixpoint_lanes` consumes with zero device transposes.
    ``pad_blocks`` (>= ``fmt.blocks``, a multiple of ``num_chunks``) sets the
    padded block count; dummy pad blocks are all-zero (profile 0 = valid).
    This is one numpy copy — the same cost as any other staging layout.
    """
    B, C, S, K = fmt.blocks, fmt.channels, fmt.block_size, num_chunks
    assert pad_blocks >= B and pad_blocks % K == 0, (pad_blocks, B, K)
    Bc = pad_blocks // K
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=B * fmt.block_size_xa
    ).reshape(B, C, S)
    padded = np.zeros((pad_blocks, C, S), np.uint8)
    padded[:B] = raw
    # [K, Bc, C, S] -> [Bc, S, K, C] -> [Bc, S, K*C]
    return np.ascontiguousarray(
        padded.reshape(K, Bc, C, S).transpose(1, 3, 0, 2)
    ).reshape(Bc, S, K * C)


def words_from_blocks_host(
    blocks_t: np.ndarray, bits: int
) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`pack_words_from_lanes` for host staging.

    ``uint8[B, S, L] -> (prof uint8[B, L], words int32[B, bits, L])`` —
    one strided copy (the same cost class as lane-major staging itself)
    followed by a free little-endian int32 view.
    """
    B, S, L = blocks_t.shape
    assert S == 4 * bits + 1, (S, bits)
    prof = np.ascontiguousarray(blocks_t[:, 0, :])
    pay = np.ascontiguousarray(
        blocks_t[:, 1:, :].reshape(B, bits, 4, L).transpose(0, 1, 3, 2)
    )
    words = pay.view("<i4")[..., 0]
    return prof, words


def check_valid(valid: np.ndarray, channels: int) -> None:
    """Raise the EPROTO-equivalent naming the first bad block, if any.

    ``valid``: ``bool[B, C]`` in stream order (channel-minor).
    """
    v = np.asarray(valid)
    if v.all():
        return
    flat = v.reshape(v.shape[0] * channels)
    idx = int(np.argmin(flat))
    raise BjxaProtocolError(
        f"invalid block profile factor in block {idx // channels}"
        f" channel {idx % channels}"
    )


def decode_bytes_validity(
    payload: bytes | memoryview,
    fmt: XAFormat,
    *,
    parallel: bool = True,
    min_chunk_blocks: int = 8,
    max_chunks: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode one XA payload without raising on invalid profiles.

    The shared core of :func:`decode_bytes` and the CLI's valid-prefix
    error path — both go through the same block-count-bucketed compiled
    programs, so a corrupt corpus costs zero extra compiles.

    Returns ``(frames int16[>=samples, C], valid bool[B, C])`` — frames
    past the first invalid block are garbage (the reference stops there;
    callers slice the valid prefix).
    """
    state = fmt.initial_state_array()
    B = fmt.blocks
    # Bucket the block count so files of similar length share one compiled
    # program (dummy profile-0 blocks pad the tail and are trimmed).
    Bp = B if B <= 64 else pad_bucket(B)
    target_lanes = 8192
    num_chunks = min(
        max_chunks,
        max(1, target_lanes // fmt.channels),
        max(1, Bp // min_chunk_blocks),
    )
    while Bp % num_chunks:  # chunk grid must tile the padded block range
        num_chunks -= 1
    if parallel and num_chunks > 1:
        blocks_t = chunk_lanes_from_bytes(payload, fmt, num_chunks, Bp)
        frames, _end, valid, _it = decode_fixpoint_lanes(
            blocks_t,
            state,
            bits=fmt.bits,
            num_chunks=num_chunks,
            channels=fmt.channels,
            b_total=Bp,
        )
    else:
        blocks = blocks_from_bytes(payload, fmt)
        if Bp != B:
            blocks = np.concatenate(
                [
                    blocks,
                    np.zeros(
                        (fmt.channels, Bp - B, fmt.block_size), np.uint8
                    ),
                ],
                axis=1,
            )
        frames, _end, valid = decode_arrays(blocks, state, bits=fmt.bits)
    return frames, valid[:B]


#: Byte budget (payload + PCM) above which whole-file decode/encode
#: switches to the segmented bounded-memory pipelines; override with
#: ``BJXA_SEGMENT_THRESHOLD``.  The format allows u32 sizes
#: (``bjxa.5.rst:77-79``); the reference streams with O(block) memory.
SEGMENT_THRESHOLD = 256 << 20
SEGMENT_BLOCKS = 65536


def segment_threshold() -> int:
    """The active segmentation byte threshold (env-overridable)."""
    import os

    env = os.environ.get("BJXA_SEGMENT_THRESHOLD", "")
    if not env:
        return SEGMENT_THRESHOLD
    try:
        return int(env)
    except ValueError:
        from bjxa_tpu.errors import BjxaInvalidState

        raise BjxaInvalidState(f"Invalid BJXA_SEGMENT_THRESHOLD {env!r}")


def iter_decode_segments(
    read,
    fmt: XAFormat,
    *,
    segment_blocks: int = SEGMENT_BLOCKS,
    parallel: bool = True,
    mesh=None,
    sp_axis: str = "sp",
):
    """Bounded-memory device decode: stream a file through the device in
    fixed-size block segments, carrying the exact predictor end state
    between segments.

    Sequential segments need no boundary fixed point: each segment's entry
    state is the true decoded state (the last two samples of the previous
    segment), so the intra-segment chunk fixpoint runs as usual and the
    yielded PCM is bit-identical to the one-shot path.  Peak memory is
    O(segment) regardless of the header's u32-scale ``data_len`` — the
    device-rate analog of the reference's O(block) streaming loop
    (``src/bjxa_decode.c:102-161``; u32 sizes ``bjxa.5.rst:77-79``).

    All full segments share one compiled program (the tail buckets like
    any short file).

    Args:
      read: ``read(nbytes) -> bytes`` pulling from the stream (a short
        result means the stream is truncated).
      segment_blocks: effective blocks per segment (65536 ≈ 3.2 MB XA /
        16 MB PCM at 6-bit stereo).

    With a multi-device ``mesh`` carrying an ``sp_axis`` of size > 1,
    every segment's block range is additionally sequence-parallel sharded
    across the mesh devices (the ppermute boundary-state ring) — the
    pod-scale path for huge files: O(segment) host memory AND all chips
    decoding, still bit-identical.

    Yields interleaved ``int16[n, channels]`` numpy frames per segment.
    Raises :class:`BjxaProtocolError` after yielding a failing segment's
    valid prefix, or :class:`EOFError` after yielding a truncated
    stream's decoded prefix (callers emit the reference's stderr labels).

    Single-device segments PIPELINE: the carried predictor state stays
    device-resident (the next segment's decode is dispatched against the
    previous segment's not-yet-materialized end state), and each
    segment's PCM transfers back while the next segment is being staged
    and decoded — JAX's async dispatch overlaps read, H2D, compute, and
    D2H across consecutive segments with one extra segment of host
    memory.  Measured (`benchmarks/bench_segmented.py`, tunnel-bound):
    the pipelined loop moves PCM at ~70-80% of the bracketing link
    probes (15.6 MB/s median, 22.8 best) where the serial loop peaked at
    8.9 MB/s — roughly 1.8x under comparable link weather.
    """
    import dataclasses

    use_mesh = (
        mesh is not None
        and sp_axis in getattr(mesh, "shape", {})
        and mesh.shape[sp_axis] > 1
    )
    C = fmt.channels
    state = fmt.initial_state_array()  # np carry for the mesh path
    state_dev = None  # device-resident carry for the pipelined path
    left_blocks = fmt.blocks
    done_blocks = 0
    pending = None  # previous segment: (frames_array, n_frames)

    def flush():
        nonlocal pending
        if pending is None:
            return None
        arr, n = pending
        pending = None
        out = np.asarray(arr)[:n]
        return out if out.size else None

    while left_blocks > 0:
        nblk = min(segment_blocks, left_blocks)
        payload = read(nblk * fmt.block_size_xa) or b""
        avail = len(payload) // fmt.block_size_xa
        truncated = avail < nblk
        use = avail if truncated else nblk
        if use == 0:
            out = flush()
            if out is not None:
                yield out
            raise EOFError("truncated XA stream")

        # validity from the profile plane, host-side (no device round
        # trip): block-major, channel-minor like the stream layout
        raw = np.frombuffer(
            payload, np.uint8, count=use * fmt.block_size_xa
        ).reshape(use, C, fmt.block_size)
        vb = (raw[:, :, 0] >> 4) < 5  # [use, C]
        allv = vb.all(axis=1)
        good = int(np.argmin(allv)) if not allv.all() else use
        limit = min(use * BLOCK_SAMPLES,
                    fmt.samples - done_blocks * BLOCK_SAMPLES)
        n_frames = min(good * BLOCK_SAMPLES, limit)

        sub = dataclasses.replace(
            fmt,
            data_len=use * fmt.block_size_xa,
            samples=use * BLOCK_SAMPLES,
        )
        if use_mesh:
            from bjxa_tpu.parallel.sharded import decode_file_sharded

            anchor = state if state_dev is None else state_dev
            frames, _valid, _rounds = decode_file_sharded(
                blocks_from_bytes(payload[: sub.data_len], sub),
                anchor,
                bits=fmt.bits,
                mesh=mesh,
                axis=sp_axis,
            )
            state_dev = None
            if not truncated and use > 0:
                fr = frames[use * BLOCK_SAMPLES - 2: use * BLOCK_SAMPLES]
                state = np.stack([fr[1], fr[0]], axis=-1).astype(np.int32)
        else:
            # pipelined device path: chunk-parallel fixpoint per segment,
            # state carried as a device array (no host sync between
            # dispatches)
            Bp = use if use <= 64 else pad_bucket(use)
            num_chunks = min(
                4096, max(1, 8192 // C), max(1, Bp // 8)
            )
            while Bp % num_chunks:
                num_chunks -= 1
            if parallel and num_chunks > 1:
                blocks_t = chunk_lanes_from_bytes(
                    payload[: sub.data_len], sub, num_chunks, Bp
                )
                anchor = (
                    jnp.asarray(state) if state_dev is None else state_dev
                )
                frames, end_dev, _v, _it = decode_fixpoint_lanes(
                    blocks_t,
                    anchor,
                    bits=fmt.bits,
                    num_chunks=num_chunks,
                    channels=C,
                    b_total=Bp,
                )
            else:
                frames, _valid = decode_bytes_validity(
                    payload[: sub.data_len],
                    dataclasses.replace(
                        sub,
                        initial_state=tuple(
                            tuple(int(x) for x in row)
                            for row in np.asarray(
                                state if state_dev is None else state_dev
                            )
                        )
                        + ((0, 0),) * (2 - C),
                    ),
                    parallel=False,
                )
                end_dev = None
            if Bp == use and end_dev is not None:
                state_dev = end_dev  # exact: no pad blocks ran
            else:
                # pad blocks drag the in-graph end state to zero; the
                # true end lives after the last real block (lazy device
                # slice — still no host sync)
                state_dev = jnp.stack(
                    [
                        frames[use * BLOCK_SAMPLES - 1],
                        frames[use * BLOCK_SAMPLES - 2],
                    ],
                    axis=-1,
                ).astype(jnp.int32)
            fn = getattr(frames, "copy_to_host_async", None)
            if fn is not None:
                fn()

        out = flush()  # previous segment lands while this one decodes
        if out is not None:
            yield out
        pending = (frames, n_frames)
        if good < use:
            out = flush()
            if out is not None:
                yield out
            idx = int(np.argmin(vb.reshape(-1)))
            raise BjxaProtocolError(
                f"invalid block profile factor in block "
                f"{done_blocks + idx // C} channel {idx % C}"
            )
        if truncated:
            out = flush()
            if out is not None:
                yield out
            raise EOFError("truncated XA stream")
        left_blocks -= use
        done_blocks += use
    out = flush()
    if out is not None:
        yield out


def decode_bytes(
    payload: bytes | memoryview,
    fmt: XAFormat,
    *,
    parallel: bool = True,
    min_chunk_blocks: int = 8,
    max_chunks: int = 4096,
    mesh=None,
    sp_axis: str = "sp",
    sp_min_blocks: int = 2048,
) -> np.ndarray:
    """Decode one XA payload to interleaved PCM ``int16[samples, C]``.

    Chooses the chunk-parallel fixed-point pipeline for long streams and the
    plain scan for short ones.  Raises BjxaProtocolError on an invalid
    profile factor anywhere in the stream.

    With a multi-device ``mesh`` carrying an ``sp_axis`` of size > 1 and a
    stream of at least ``sp_min_blocks`` blocks, the block range is
    sequence-parallel sharded across the mesh devices (the ppermute
    boundary-state ring of :func:`bjxa_tpu.parallel.sharded.decode_file_sharded`)
    — bit-exact with the single-device paths.

    Chunk-count heuristic: fill the Pallas lane grid (8192 lanes — the
    measured sweet spot on v5e) when the stream is long enough — each chunk
    must still hold enough blocks (``min_chunk_blocks``) that the fixed
    point converges in a few rounds (state transients die within ~5
    blocks).
    """
    if (
        mesh is not None
        and sp_axis in getattr(mesh, "shape", {})
        and mesh.shape[sp_axis] > 1
        and fmt.blocks >= sp_min_blocks
    ):
        from bjxa_tpu.parallel.sharded import decode_file_sharded

        blocks = blocks_from_bytes(payload, fmt)
        pcm, valid, _rounds = decode_file_sharded(
            blocks,
            fmt.initial_state_array(),
            bits=fmt.bits,
            mesh=mesh,
            axis=sp_axis,
        )
        check_valid(valid[: fmt.blocks], fmt.channels)
        return np.asarray(pcm[: fmt.samples])
    frames, valid = decode_bytes_validity(
        payload,
        fmt,
        parallel=parallel,
        min_chunk_blocks=min_chunk_blocks,
        max_chunks=max_chunks,
    )
    check_valid(np.asarray(valid), fmt.channels)
    return np.asarray(frames[: fmt.samples])
