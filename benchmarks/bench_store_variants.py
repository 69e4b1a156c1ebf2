"""Micro-bench: store-side variants of the fused decode kernel.

The ablation (bench_ablate.py) shows the PCM store path costs half the
kernel time (65 vs 146.5 Gsamp/s states-only on v5e).  This measures
store-format variants to find where the cost sits:

  a. int16 per-sample store (current production kernel)
  b. int32 per-sample store (no int32->int16 repack; 2x bytes written)
  c. paired store: two consecutive samples packed into one int32 word
     ((s0 & 0xFFFF) | (s1 << 16)); half the store ops, same bytes as (a);
     output int32[B, 16, sub, ln] whose little-endian int16 view is the
     natural [B, 32, ...] sample order per lane.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bjxa_tpu.cli import _enable_compile_cache
from bjxa_tpu.ops.pallas_decode import _sel_gain, _sign16, pick_tiles
from bjxa_tpu.ops.tables import BLOCK_SAMPLES, GAIN_K0, GAIN_K1, INT16_MAX, INT16_MIN


def _kernel(blocks_ref, state_ref, out_ref, end_ref, st_ref, *,
            bits: int, block_tile: int, mode: str):
    b = pl.program_id(1)
    num_b = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        st_ref[...] = state_ref[...]

    p0 = st_ref[0]
    p1 = st_ref[1]
    for j in range(block_tile):
        prof = blocks_ref[j, 0].astype(jnp.int32)
        factor = prof >> 4
        shift = prof & 0x0F
        k0 = _sel_gain(factor, GAIN_K0)
        k1 = _sel_gain(factor, GAIN_K1)

        def byte(i):
            return blocks_ref[j, 1 + i].astype(jnp.int32)

        prev_s = None
        for n in range(BLOCK_SAMPLES):
            v = byte(n) << 8  # bits=8 only in this micro-bench
            ranged = _sign16(v) >> shift
            g = p0 * k0 + p1 * k1
            s = ranged + ((g + ((g >> 31) & 255)) >> 8)
            s = jnp.clip(s, INT16_MIN, INT16_MAX)
            if mode == "i16":
                out_ref[j, n] = s.astype(jnp.int16)
            elif mode == "i32":
                out_ref[j, n] = s
            elif mode == "pair":
                if n % 2 == 1:
                    w = (prev_s & 0xFFFF) | (s << 16)
                    out_ref[j, n // 2] = w
                prev_s = s
            p1 = p0
            p0 = s
    st_ref[0] = p0
    st_ref[1] = p1

    @pl.when(b == num_b - 1)
    def _():
        end_ref[...] = st_ref[...]


@partial(jax.jit, static_argnames=("bits", "lane_tile", "block_tile",
                                   "sublanes", "mode"))
def decode_variant(blocks_t, state, *, bits, lane_tile, block_tile,
                   sublanes, mode):
    B, S, L = blocks_t.shape
    ln = lane_tile // sublanes
    LN = L // sublanes
    b4 = blocks_t.reshape(B, S, sublanes, LN)
    st4 = state.transpose(1, 0).reshape(2, sublanes, LN)
    if mode == "i16":
        rows, dt = BLOCK_SAMPLES, jnp.int16
    elif mode == "i32":
        rows, dt = BLOCK_SAMPLES, jnp.int32
    else:
        rows, dt = BLOCK_SAMPLES // 2, jnp.int32
    out, end = pl.pallas_call(
        partial(_kernel, bits=bits, block_tile=block_tile, mode=mode),
        grid=(L // lane_tile, B // block_tile),
        in_specs=[
            pl.BlockSpec((block_tile, S, sublanes, ln),
                         lambda l, b: (b, 0, 0, l)),
            pl.BlockSpec((2, sublanes, ln), lambda l, b: (0, 0, l)),
        ],
        out_specs=[
            pl.BlockSpec((block_tile, rows, sublanes, ln),
                         lambda l, b: (b, 0, 0, l)),
            pl.BlockSpec((2, sublanes, ln), lambda l, b: (0, 0, l)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, rows, sublanes, LN), dt),
            jax.ShapeDtypeStruct((2, sublanes, LN), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((2, sublanes, ln), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(b4, st4)
    return out, end.reshape(2, L).transpose(1, 0)


def main() -> None:
    _enable_compile_cache()
    bits = 8
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

    # correctness: pair mode's int16 view must equal the i16 output
    small = blocks_t[:8, :, :lane_tile]
    st_small = states0[:lane_tile]
    kw = dict(bits=bits, lane_tile=lane_tile, block_tile=block_tile,
              sublanes=sublanes)
    ref_out, ref_end = decode_variant(small, st_small, mode="i16", **kw)
    pair_out, pair_end = decode_variant(small, st_small, mode="pair", **kw)
    import numpy as np
    pv = np.asarray(pair_out).view("<i2").reshape(8, BLOCK_SAMPLES, -1,
                                                  order="C")
    # int32[B,16,sub,LN] little-endian view -> int16[B,16,sub,LN,2]
    pv = np.asarray(pair_out).view("<u4")
    lo = (pv & 0xFFFF).astype(np.uint16).view(np.int16)
    hi = (pv >> 16).astype(np.uint16).view(np.int16)
    rebuilt = np.stack([lo, hi], axis=2).reshape(8, BLOCK_SAMPLES, -1)
    ref = np.asarray(ref_out).reshape(8, BLOCK_SAMPLES, -1)
    assert (rebuilt == ref).all(), "pair layout mismatch"
    assert (np.asarray(pair_end) == np.asarray(ref_end)).all()
    print("pair mode bit-exact ✓")

    def measure(mode, T, reps=8):
        @jax.jit
        def chain(b, st, t):
            def body(_, carry):
                st, chk = carry
                out, end = decode_variant.__wrapped__(
                    b, st, mode=mode, **kw)
                st = end + (out[-1, -1].astype(jnp.int32).reshape(-1, 1)
                            >> 15)
                return st, chk + jnp.sum(end)
            st, chk = lax.fori_loop(0, t, body, (st, jnp.int32(0)))
            return chk

        int(chain(blocks_t, states0, jnp.int32(T)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(blocks_t, states0, jnp.int32(T)))
            best = min(best, time.perf_counter() - t0)
        return best

    samples_per_iter = lanes * nblocks * 32
    for mode in ("i16", "i32", "pair"):
        d4 = measure(mode, 4)
        d32 = measure(mode, 32)
        rate = 28 * samples_per_iter / max(d32 - d4, 1e-9)
        print(f"{mode:5s}  {rate/1e9:.1f} Gsamp/s")


if __name__ == "__main__":
    main()
