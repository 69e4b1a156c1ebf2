"""Device compute path: vectorized inflate/deflate, scan filter, pipelines."""

from bjxa_tpu.ops.tables import BLOCK_SAMPLES, GAIN_K0, GAIN_K1
from bjxa_tpu.ops.decode import (
    decode_arrays,
    decode_arrays_fixpoint,
    decode_batch,
    decode_bytes,
    blocks_from_bytes,
)

__all__ = [
    "BLOCK_SAMPLES",
    "GAIN_K0",
    "GAIN_K1",
    "decode_arrays",
    "decode_arrays_fixpoint",
    "decode_batch",
    "decode_bytes",
    "blocks_from_bytes",
]
