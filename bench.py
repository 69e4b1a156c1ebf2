"""Headline benchmark: XA decode throughput per chip.

Prints one JSON line:
  {"metric": "decode_throughput", "value": <Msamples/s>,
   "unit": "Msamples/s", "vs_baseline": <ratio>}

Baseline (BASELINE.md): the reference C library decodes ~100 Msamples/s on
one Xeon core (measured during the survey; the project publishes no
numbers of its own).

Methodology: the workload is a large batch of 8-bit stereo streams decoded
by the full device pipeline (unpack -> layout -> prediction-filter kernel).
To measure the chip rather than host/tunnel launch latency, T pipeline
iterations are chained inside one jit (each iteration's end state feeds
the next, so nothing can be hoisted or elided) and the steady-state rate
is the work/time *slope* between a short and a long chain — launch
overhead and data staging cancel out.  Data is generated on-device.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax, random

    from bjxa_tpu.ops.decode import decode_batch

    bits = int(os.environ.get("BENCH_BITS", "8"))
    n_files = int(os.environ.get("BENCH_FILES", "16384"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    channels = 2
    t_short = int(os.environ.get("BENCH_T_SHORT", "2"))
    t_long = int(os.environ.get("BENCH_T_LONG", "10"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    size = bits * 4 + 1

    @jax.jit
    def gen(key):
        kd, kf, ks = random.split(key, 3)
        blocks = random.randint(
            kd, (n_files, channels, nblocks, size), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        factor = random.randint(kf, (n_files, channels, nblocks), 0, 5)
        shift = random.randint(ks, (n_files, channels, nblocks), 0, 16)
        prof = (factor << 4 | shift).astype(jnp.uint8)
        return blocks.at[..., 0].set(prof)

    blocks = gen(random.PRNGKey(7))
    states0 = jnp.zeros((n_files, channels, 2), jnp.int32)
    jax.block_until_ready(blocks)

    decode_core = decode_batch.__wrapped__

    @jax.jit
    def chain(b, st, T):  # T is a traced trip count: one compile for all T
        def body(_, carry):
            st, chk = carry
            frames, end, valid = decode_core(b, st, bits=bits)
            # real (bounded) dependency on the sample output so the
            # pcm writes can't be dead-code-eliminated
            st = end + (
                frames[:, -1, :].astype(jnp.int32)[..., None] >> 15
            )
            chk = chk + jnp.sum(end)
            return st, chk
        st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
        return chk

    def measure(T):
        t_arr = jnp.int32(T)
        int(chain(blocks, states0, t_arr))  # compile (first call) + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            int(chain(blocks, states0, t_arr))
        return (time.perf_counter() - t0) / reps

    dt_short = measure(t_short)
    dt_long = measure(t_long)
    samples_per_iter = n_files * channels * nblocks * 32
    slope = (t_long - t_short) * samples_per_iter / max(
        dt_long - dt_short, 1e-9
    )
    msps = slope / 1e6
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
