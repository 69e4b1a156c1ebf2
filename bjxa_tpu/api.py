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
