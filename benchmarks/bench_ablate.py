"""Ablation micro-bench: which side of the fused decode kernel binds?

Times the full fused kernel (loads + filter + int16 stores) against the
states-only variant (same loads + filter, no PCM stores) at the headline
bench shapes.  If states-only is much faster, stores bind; if it matches,
loads bind.  Chained-slope methodology as in bench.py.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
from jax import lax, random

from bjxa_tpu.cli import _enable_compile_cache
from bjxa_tpu.ops.pallas_decode import fused_decode_lanes, pick_tiles


def main() -> None:
    _enable_compile_cache()
    bits = int(os.environ.get("BENCH_BITS", "8"))
    lanes = int(os.environ.get("BENCH_LANES", "32768"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    size = bits * 4 + 1
    sublanes, lane_tile, block_tile = pick_tiles(lanes, nblocks)

    @jax.jit
    def gen(key):
        kd, kf, ks = random.split(key, 3)
        blocks_t = random.randint(
            kd, (nblocks, size, lanes), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        factor = random.randint(kf, (nblocks, lanes), 0, 5)
        shift = random.randint(ks, (nblocks, lanes), 0, 16)
        prof = (factor << 4 | shift).astype(jnp.uint8)
        return blocks_t.at[:, 0, :].set(prof)

    blocks_t = gen(random.PRNGKey(7))
    states0 = jnp.zeros((lanes, 2), jnp.int32)
    jax.block_until_ready(blocks_t)

    def make_chain(with_output: bool):
        @jax.jit
        def chain(b, st, T):
            def body(_, carry):
                st, chk = carry
                pcm, end = fused_decode_lanes.__wrapped__(
                    b, st, bits=bits, lane_tile=lane_tile,
                    block_tile=block_tile, sublanes=sublanes,
                    with_output=with_output,
                )
                if pcm is not None:
                    st = end + (pcm[-1, -1].astype(jnp.int32)[:, None] >> 15)
                else:
                    st = end
                chk = chk + jnp.sum(end)
                return st, chk
            st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
            return chk
        return chain

    def measure(chain, T, reps=8):
        t_arr = jnp.int32(T)
        int(chain(blocks_t, states0, t_arr))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(blocks_t, states0, t_arr))
            best = min(best, time.perf_counter() - t0)
        return best

    samples_per_iter = lanes * nblocks * 32
    for label, with_output in (("full", True), ("states-only", False)):
        chain = make_chain(with_output)
        d4 = measure(chain, 4)
        d32 = measure(chain, 32)
        rate = 28 * samples_per_iter / max(d32 - d4, 1e-9)
        print(f"{label:12s} bits={bits}  {rate/1e9:.1f} Gsamp/s")


if __name__ == "__main__":
    main()
