"""Measured roofline denominator: a pure load/store Pallas kernel on the
EXACT shape, layout, grid, block specs and scratch of the fused
packed-words decode kernel — the filter replaced by a near-zero ALU
derivation — giving the achievable-bandwidth bound for this layout on
this chip.

PERFORMANCE.md's roofline section previously divided by an ASSUMED
~819 GB/s HBM rate; this kernel measures what a memory-bound kernel of
identical traffic can actually sustain (grid/tile boundary effects and
all), so decode can be stated as a percentage of a *measured* bound.

Run manually from the repo root:
    python benchmarks/bench_roofline_bound.py
Env: BENCH_BITS/BENCH_FILES/BENCH_BLOCKS (headline-shape defaults),
BENCH_T_SHORT/BENCH_T_LONG/BENCH_REPS (chained-slope controls).
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, random
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bjxa_tpu.cli import _enable_compile_cache
    from bjxa_tpu.ops.pallas_decode import SUBLANES
    from bjxa_tpu.ops.tables import BLOCK_SAMPLES

    _enable_compile_cache()

    bits = int(os.environ.get("BENCH_BITS", "8"))
    n_files = int(os.environ.get("BENCH_FILES", "16384"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    t_short = int(os.environ.get("BENCH_T_SHORT", "4"))
    t_long = int(os.environ.get("BENCH_T_LONG", "32"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    lane_tile, block_tile = 2048, 8
    channels = 2
    L = n_files * channels
    B = nblocks
    W = bits
    sub = SUBLANES
    ln = lane_tile // sub
    LN = L // sub

    def _null_kernel(prof_ref, words_ref, state_ref, out_ref, end_ref,
                     st_ref, *, block_tile):
        """Same refs/scratch/grid as _decode_words_kernel; body touches
        every input byte and writes every output element with minimal
        ALU (one add per store), so the runtime is the memory system."""
        b = pl.program_id(1)
        num_b = pl.num_programs(1)

        @pl.when(b == 0)
        def _():
            st_ref[...] = state_ref[...]

        acc = st_ref[0]
        for j in range(block_tile):
            prof = prof_ref[j, 0].astype(jnp.int32)
            words = [words_ref[j, wi] for wi in range(W)]
            base = prof
            for w in words:
                base = base + w  # touch every loaded word once
            for n in range(BLOCK_SAMPLES):
                out_ref[j, n] = (base + n).astype(jnp.int16)
            acc = acc + base
        st_ref[0] = acc

        @pl.when(b == num_b - 1)
        def _():
            end_ref[...] = st_ref[...]

    @partial(jax.jit, static_argnames=())
    def null_decode(prof, words, state):
        p4 = prof.reshape(B, 1, sub, LN)
        w4 = words.reshape(B, W, sub, LN)
        st4 = state.transpose(1, 0).reshape(2, sub, LN)
        in_specs = [
            pl.BlockSpec((block_tile, 1, sub, ln), lambda l, b: (b, 0, 0, l)),
            pl.BlockSpec((block_tile, W, sub, ln), lambda l, b: (b, 0, 0, l)),
            pl.BlockSpec((2, sub, ln), lambda l, b: (0, 0, l)),
        ]
        end_spec = pl.BlockSpec((2, sub, ln), lambda l, b: (0, 0, l))
        out, end = pl.pallas_call(
            partial(_null_kernel, block_tile=block_tile),
            grid=(L // lane_tile, B // block_tile),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (block_tile, BLOCK_SAMPLES, sub, ln),
                    lambda l, b: (b, 0, 0, l),
                ),
                end_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, BLOCK_SAMPLES, sub, LN), jnp.int16),
                jax.ShapeDtypeStruct((2, sub, LN), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((2, sub, ln), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(p4, w4, st4)
        return out, end.reshape(2, L).transpose(1, 0)

    @jax.jit
    def gen(key):
        kd, kf = random.split(key)
        words = random.randint(
            kd, (B, W, L), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, jnp.int32,
        )
        prof = random.randint(kf, (B, L), 0, 80).astype(jnp.uint8)
        return prof, words

    prof, words = gen(random.PRNGKey(5))
    st0 = jnp.zeros((L, 2), jnp.int32)
    jax.block_until_ready(words)

    @jax.jit
    def chain(p, w, st, T):
        def body(_, carry):
            st, chk = carry
            pcm, end = null_decode(p, w, st)
            while pcm.ndim:
                pcm = pcm[-1]
            st = end + (pcm.astype(jnp.int32) >> 15)
            chk = chk + jnp.sum(end)
            return st, chk

        st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
        return chk

    def measure(T):
        t_arr = jnp.int32(T)
        int(chain(prof, words, st0, t_arr))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(prof, words, st0, t_arr))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_short = measure(t_short)
    dt_long = measure(t_long)
    samples_per_iter = L * B * 32
    slope = (t_long - t_short) * samples_per_iter / max(
        dt_long - dt_short, 1e-9
    )
    msps = slope / 1e6
    # identical traffic to the decode kernel at this shape
    read_bytes = B * L * (W * 4 + 1)
    write_bytes = B * 32 * L * 2
    gbs = slope / samples_per_iter * (read_bytes + write_bytes) / 1e9
    print(
        json.dumps(
            {
                "metric": "loadstore_bound",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "gb_per_s": round(gbs, 1),
                "bits": bits,
                "lanes": L,
                "blocks": B,
            }
        )
    )


if __name__ == "__main__":
    main()
