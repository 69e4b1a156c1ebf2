"""Headline benchmark: XA decode throughput per chip.

Prints one JSON line:
  {"metric": "decode_throughput", "value": <Msamples/s>,
   "unit": "Msamples/s", "vs_baseline": <ratio>}

Baseline (BASELINE.md): the reference C library decodes ~100 Msamples/s on
one Xeon core (measured; the project publishes no numbers of its own).

The workload decodes a large batch of synthetic 8-bit stereo streams —
the same shape of work as the reference's throughput measurement (50x
square-stereo-8.xa), but batched the TPU way: thousands of independent
channel lanes scanning in lockstep on the VPU.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def make_corpus(n_files: int, channels: int, nblocks: int, bits: int, seed=7):
    from bjxa_tpu.ops.tables import block_size_for_bits

    rng = np.random.default_rng(seed)
    size = block_size_for_bits(bits)
    blocks = rng.integers(
        0, 256, size=(n_files, channels, nblocks, size), dtype=np.uint8
    )
    factor = rng.integers(0, 5, size=(n_files, channels, nblocks))
    shift = rng.integers(0, 16, size=(n_files, channels, nblocks))
    blocks[..., 0] = (factor << 4 | shift).astype(np.uint8)
    states = np.zeros((n_files, channels, 2), np.int32)
    return blocks, states


def main() -> None:
    import jax

    from bjxa_tpu.ops.decode import decode_batch

    bits = int(os.environ.get("BENCH_BITS", "8"))
    n_files = int(os.environ.get("BENCH_FILES", "16384"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    channels = 2
    reps = int(os.environ.get("BENCH_REPS", "5"))

    blocks, states = make_corpus(n_files, channels, nblocks, bits)
    blocks_d = jax.device_put(blocks)
    states_d = jax.device_put(states)

    def run():
        pcm, end, valid = decode_batch(blocks_d, states_d, bits=bits)
        jax.block_until_ready(pcm)
        return pcm

    run()  # compile + warm up
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps

    samples = n_files * channels * nblocks * 32
    msps = samples / dt / 1e6
    baseline_msps = 100.0
    print(
        json.dumps(
            {
                "metric": "decode_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
