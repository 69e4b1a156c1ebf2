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
) -> bytes:
    """Encode interleaved PCM ``int16[samples, C]`` to an XA file image.

    ``search=True`` runs the per-block exhaustive filter-profile sweep;
    ``search=False`` reproduces the reference encoder byte-for-byte
    (profile 0, truncation only).
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

    if search:
        profiles, coded, _recon, _end = encode_search(
            jnp.asarray(lanes), jnp.zeros((channels, 2), jnp.int32), bits=bits
        )
    else:
        profiles, coded = encode_truncate(jnp.asarray(lanes))
    # [B, 32, C] -> [B, C, 32] so packed bytes land channel-major inside
    # each effective block, matching the file layout.
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
