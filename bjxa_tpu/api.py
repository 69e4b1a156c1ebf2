"""High-level one-shot conversion API.

The whole-file equivalents of the reference CLI drivers
(``src/bjxa_decode.c``/``src/bjxa_encode.c`` in their ``BJXA_SINGLE_PASS``
mode): bytes in, bytes out, with header work on the host and sample work on
the device.
"""

from __future__ import annotations

import numpy as np

from bjxa_tpu.errors import BjxaIOError
from bjxa_tpu.format import (
    XA_HEADER_SIZE,
    XAFormat,
    parse_xa_header,
    dump_riff_header,
    dump_pcm,
)
from bjxa_tpu.ops.decode import decode_bytes


def decode_xa(data: bytes) -> tuple[XAFormat, np.ndarray]:
    """Decode a whole XA file image to (format, ``int16[samples, C]``)."""
    fmt = parse_xa_header(data)
    payload = memoryview(data)[XA_HEADER_SIZE:]
    if len(payload) < fmt.data_len:
        raise BjxaIOError(
            f"XA stream truncated: header promises {fmt.data_len} bytes,"
            f" got {len(payload)}"
        )
    pcm = decode_bytes(payload[: fmt.data_len], fmt)
    return fmt, pcm


def xa_to_wav(data: bytes) -> bytes:
    """Convert a whole XA file image to a canonical WAVE file image."""
    fmt, pcm = decode_xa(data)
    hdr = dump_riff_header(fmt.data_len_pcm, fmt.samples_rate, fmt.channels)
    return hdr + dump_pcm(pcm)


def encode_pcm(
    pcm: np.ndarray,
    samples_rate: int,
    bits: int = 6,
    *,
    search: bool = True,
    mesh=None,
    sp_axis: str = "sp",
    sp_min_blocks: int = 2048,
) -> bytes:
    """Encode interleaved PCM ``int16[samples, C]`` to an XA file image.

    ``search=True`` runs the per-block exhaustive filter-profile sweep;
    ``search=False`` reproduces the reference encoder byte-for-byte
    (profile 0, truncation only).  With a multi-device ``mesh`` carrying
    an ``sp_axis`` of size > 1 and at least ``sp_min_blocks`` blocks, the
    search's block range shards across the devices through the ppermute
    boundary-state ring
    (:func:`bjxa_tpu.parallel.sharded.encode_file_sharded`) —
    bit-identical to the sequential greedy search.
    """
    import jax.numpy as jnp

    from bjxa_tpu.errors import BjxaInvalidState
    from bjxa_tpu.format import BLOCK_SAMPLES, dump_xa_header
    from bjxa_tpu.ops.deflate import deflate_blocks
    from bjxa_tpu.ops.encode import encode_search, encode_truncate

    if bits not in (4, 6, 8):
        raise BjxaInvalidState(f"encode_pcm: invalid bit depth {bits}")
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    samples, channels = pcm.shape
    if samples <= 0:
        raise BjxaIOError("encode_pcm: empty stream")
    if channels not in (1, 2):
        raise BjxaInvalidState(f"encode_pcm: bad channel count {channels}")

    nblocks = -(-samples // BLOCK_SAMPLES)
    padded = np.zeros((nblocks * BLOCK_SAMPLES, channels), np.int32)
    padded[:samples] = pcm
    lanes = padded.reshape(nblocks, BLOCK_SAMPLES, channels)

    use_mesh = (
        search
        and mesh is not None
        and sp_axis in getattr(mesh, "shape", {})
        and mesh.shape[sp_axis] > 1
        and nblocks >= sp_min_blocks
    )
    if use_mesh:
        from bjxa_tpu.parallel.sharded import encode_file_sharded

        blocks_np, _end, _rounds = encode_file_sharded(
            lanes,
            np.zeros((channels, 2), np.int32),
            bits=bits,
            mesh=mesh,
            axis=sp_axis,
        )
        profiles = coded = None
        payload = blocks_np.tobytes()
    elif search:
        from bjxa_tpu.ops.encode import (
            encode_search_fixpoint,
            pick_encode_chunks,
        )

        K = pick_encode_chunks(nblocks, channels)
        if K > 1:
            # chunk-parallel exact fixed point: lifts a single stream's
            # search occupancy from `channels` lanes to K*channels,
            # bit-identical to the sequential greedy search (converges
            # in 2-4 rounds, tools/encode_fixpoint_census.py)
            profiles, coded, _recon, _end, _r = encode_search_fixpoint(
                lanes,
                np.zeros((channels, 2), np.int32),
                bits=bits,
                num_chunks=K,
            )
            profiles = jnp.asarray(profiles)
            coded = jnp.asarray(coded)
        else:
            profiles, coded, _recon, _end = encode_search(
                jnp.asarray(lanes),
                jnp.zeros((channels, 2), jnp.int32),
                bits=bits,
            )
    else:
        profiles, coded = encode_truncate(jnp.asarray(lanes))
    if not use_mesh:
        # [B, 32, C] -> [B, C, 32] so packed bytes land channel-major
        # inside each effective block, matching the file layout.
        blocks = deflate_blocks(profiles, coded.transpose(0, 2, 1), bits)
        payload = np.asarray(blocks).tobytes()

    fmt = XAFormat(
        data_len=len(payload),
        samples=samples,
        samples_rate=samples_rate,
        bits=bits,
        channels=channels,
        initial_state=((0, 0), (0, 0)),
    ).validate()
    return dump_xa_header(fmt) + payload


def decode_xa_stream(
    fin,
    fout,
    fmt: XAFormat | None = None,
    *,
    segment_blocks: int | None = None,
    mesh=None,
) -> XAFormat:
    """Segmented bounded-memory XA->WAV conversion between binary streams.

    Reads the XA header from ``fin`` (unless a pre-parsed ``fmt`` is given,
    in which case ``fin`` must be positioned at the payload), writes the
    RIFF header and PCM to ``fout`` segment by segment at O(segment) host
    memory — the stream twin of :func:`xa_to_wav` for u32-scale files
    (reference anchor: the streaming driver ``src/bjxa_decode.c:102-161``).
    With a multi-device ``mesh`` carrying an ``sp`` axis each segment
    shards across the devices.  Shared by the CLI's auto-segmented path
    and the corpus engine's oversized-file routing.

    Raises :class:`bjxa_tpu.errors.BjxaProtocolError` /
    :class:`EOFError` after writing a failing stream's valid prefix.
    """
    from bjxa_tpu.ops.decode import iter_decode_segments

    if fmt is None:
        fmt = parse_xa_header(fin.read(XA_HEADER_SIZE))
    fout.write(
        dump_riff_header(fmt.data_len_pcm, fmt.samples_rate, fmt.channels)
    )
    kw = {} if segment_blocks is None else {"segment_blocks": segment_blocks}
    for pcm in iter_decode_segments(fin.read, fmt, mesh=mesh, **kw):
        fout.write(dump_pcm(pcm))
    return fmt


def encode_wav_stream(
    fin,
    fout,
    bits: int = 6,
    *,
    search: bool = True,
    rf=None,
    segment_blocks: int | None = None,
    mesh=None,
):
    """Segmented bounded-memory WAV->XA conversion between binary streams.

    Reads the RIFF header from ``fin`` (unless a pre-parsed ``rf`` is
    given, with ``fin`` at the PCM body), writes the XA header and packed
    blocks to ``fout`` segment by segment, carrying the exact search
    state — bytes identical to :func:`wav_to_xa` at O(segment) memory
    (reference anchor: ``src/bjxa_encode.c:108-160``).  With a
    multi-device ``mesh`` carrying an ``sp`` axis each segment's search
    shards across the devices.  Returns the :class:`XAFormat` written.
    Raises :class:`EOFError` after writing a truncated stream's
    whole-block prefix.
    """
    from bjxa_tpu.format import (
        BLOCK_SAMPLES,
        RIFF_HEADER_SIZE,
        dump_xa_header,
        parse_riff_header,
    )
    from bjxa_tpu.ops.encode import iter_encode_segments

    if rf is None:
        rf = parse_riff_header(fin.read(RIFF_HEADER_SIZE))
    nblocks = -(-rf.samples // BLOCK_SAMPLES)
    fmt = XAFormat(
        data_len=nblocks * (bits * 4 + 1) * rf.channels,
        samples=rf.samples,
        samples_rate=rf.samples_rate,
        bits=bits,
        channels=rf.channels,
        initial_state=((0, 0), (0, 0)),
    ).validate()
    fout.write(dump_xa_header(fmt))
    kw = {} if segment_blocks is None else {"segment_blocks": segment_blocks}
    for blocks in iter_encode_segments(
        fin.read, rf.channels, rf.samples, bits=bits, search=search,
        mesh=mesh, **kw
    ):
        fout.write(blocks)
    return fmt


def wav_to_xa(data: bytes, bits: int = 6, *, search: bool = True) -> bytes:
    """Convert a whole WAVE file image to an XA file image."""
    from bjxa_tpu.format import (
        RIFF_HEADER_SIZE,
        load_pcm,
        parse_riff_header,
    )

    rf = parse_riff_header(data)
    body = memoryview(data)[RIFF_HEADER_SIZE:]
    if len(body) < rf.data_len_pcm:
        raise BjxaIOError("WAVE stream truncated")
    pcm = load_pcm(body[: rf.data_len_pcm], rf.channels)
    return encode_pcm(pcm, rf.samples_rate, bits, search=search)
