"""Tile-parameter sweep for the fused packed-words decode kernel.

Same chained-slope methodology as bench.py, but calling
fused_decode_words directly with explicit (sublanes, lane_tile,
block_tile) to map the DMA/VMEM tradeoff.  Run manually on the chip:
    python benchmarks/bench_tile_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from bjxa_tpu.cli import _enable_compile_cache
    from bjxa_tpu.ops.pallas_decode import fused_decode_words

    _enable_compile_cache()

    bits = int(os.environ.get("BENCH_BITS", "8"))
    lanes = int(os.environ.get("BENCH_LANES", "32768"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    reps = int(os.environ.get("BENCH_REPS", "8"))

    kd, kf, ks = random.split(random.PRNGKey(7), 3)
    words = random.randint(
        kd, (nblocks, bits, lanes),
        jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max, jnp.int32,
    )
    prof = (
        random.randint(kf, (nblocks, lanes), 0, 5) << 4
        | random.randint(ks, (nblocks, lanes), 0, 16)
    ).astype(jnp.uint8)
    states0 = jnp.zeros((lanes, 2), jnp.int32)
    jax.block_until_ready(words)

    def rate_for(sublanes, lane_tile, block_tile):
        @jax.jit
        def chain(p, w, st, T):
            def body(_, carry):
                st, chk = carry
                pcm, end = fused_decode_words(
                    p, w, st, bits=bits, lane_tile=lane_tile,
                    block_tile=block_tile, sublanes=sublanes,
                )
                while pcm.ndim:
                    pcm = pcm[-1]
                st = end + (pcm.astype(jnp.int32) >> 15)
                return st, chk + jnp.sum(end)
            st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
            return chk

        def measure(T):
            t_arr = jnp.int32(T)
            int(chain(prof, words, states0, t_arr))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                int(chain(prof, words, states0, t_arr))
                best = min(best, time.perf_counter() - t0)
            return best

        d4, d32 = measure(4), measure(32)
        return 28 * lanes * nblocks * 32 / max(d32 - d4, 1e-9) / 1e9

    results = {}
    for sublanes, lane_tile, block_tile in [
        (32, 8192, 4),    # pick_tiles default
        (32, 8192, 8),
        (32, 8192, 16),
        (32, 16384, 4),
        (32, 16384, 8),
        (32, 4096, 8),
        (16, 8192, 8),
    ]:
        key = f"sub{sublanes}_lt{lane_tile}_bt{block_tile}"
        try:
            results[key] = round(rate_for(sublanes, lane_tile, block_tile), 1)
        except Exception as e:  # shapes that don't divide etc.
            results[key] = f"error: {type(e).__name__}"
        print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps({"metric": "tile_sweep_gsamp_s", "results": results}))


if __name__ == "__main__":
    main()
