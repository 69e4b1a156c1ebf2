"""Micro-bench: load-side variants of the fused decode kernel (8-bit).

ROADMAP lead 1: the fused kernel is bound by the per-sample
uint8-load/convert/int16-store vector-op mix, not by arithmetic.  This
measures whether feeding the payload as packed int32 words (4 consecutive
payload bytes of the SAME stream per word — lane/state semantics
unchanged, only input staging changes) beats the uint8-per-sample load:

  load  u8   : uint8[B, S, sub, ln], one (sub, ln) uint8 tile + convert
               per sample (current production kernel)
  load  w32  : profile uint8[B, 1, sub, ln] + payload int32[B, 8, sub, ln];
               one int32 tile load per 4 samples, samples extracted with
               shift+mask (no u8->i32 convert)

crossed with store variants:

  store i16  : int16 per-sample store (current)
  store pair : two consecutive samples packed into one int32 word
               ((s0 & 0xFFFF) | (s1 << 16)); half the store ops

All variants are verified bit-exact against the production kernel before
timing.  Chained-slope methodology as in bench.py.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bjxa_tpu.cli import _enable_compile_cache
from bjxa_tpu.ops.pallas_decode import _sel_gain, _sign16, fused_decode_lanes, pick_tiles
from bjxa_tpu.ops.tables import BLOCK_SAMPLES, GAIN_K0, GAIN_K1, INT16_MAX, INT16_MIN


def _kernel(prof_ref, words_ref, state_ref, out_ref, end_ref, st_ref, *,
            block_tile: int, store: str):
    b = pl.program_id(1)
    num_b = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        st_ref[...] = state_ref[...]

    p0 = st_ref[0]
    p1 = st_ref[1]
    for j in range(block_tile):
        prof = prof_ref[j, 0].astype(jnp.int32)
        factor = prof >> 4
        shift = prof & 0x0F
        k0 = _sel_gain(factor, GAIN_K0)
        k1 = _sel_gain(factor, GAIN_K1)

        prev_s = None
        for wi in range(BLOCK_SAMPLES // 4):
            w = words_ref[j, wi]
            for q in range(4):
                # byte q of the word, placed in the top byte of an int16
                v = ((w >> (8 * q)) & 0xFF) << 8
                ranged = _sign16(v) >> shift
                g = p0 * k0 + p1 * k1
                s = ranged + ((g + ((g >> 31) & 255)) >> 8)
                s = jnp.clip(s, INT16_MIN, INT16_MAX)
                n = 4 * wi + q
                if store == "i16":
                    out_ref[j, n] = s.astype(jnp.int16)
                else:  # pair
                    if n % 2 == 1:
                        out_ref[j, n // 2] = (prev_s & 0xFFFF) | (s << 16)
                    prev_s = s
                p1 = p0
                p0 = s
    st_ref[0] = p0
    st_ref[1] = p1

    @pl.when(b == num_b - 1)
    def _():
        end_ref[...] = st_ref[...]


@partial(jax.jit, static_argnames=("lane_tile", "block_tile", "sublanes",
                                   "store"))
def decode_w32(prof, words, state, *, lane_tile, block_tile, sublanes,
               store):
    B, W, L = words.shape
    ln = lane_tile // sublanes
    LN = L // sublanes
    p4 = prof.reshape(B, 1, sublanes, LN)
    w4 = words.reshape(B, W, sublanes, LN)
    st4 = state.transpose(1, 0).reshape(2, sublanes, LN)
    if store == "i16":
        rows, dt = BLOCK_SAMPLES, jnp.int16
    else:
        rows, dt = BLOCK_SAMPLES // 2, jnp.int32
    out, end = pl.pallas_call(
        partial(_kernel, block_tile=block_tile, store=store),
        grid=(L // lane_tile, B // block_tile),
        in_specs=[
            pl.BlockSpec((block_tile, 1, sublanes, ln),
                         lambda l, b: (b, 0, 0, l)),
            pl.BlockSpec((block_tile, W, sublanes, ln),
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
    )(p4, w4, st4)
    return out, end.reshape(2, L).transpose(1, 0)


@jax.jit
def pack_words(blocks_t):
    """uint8[B, 33, L] -> (prof uint8[B, L], words int32[B, 8, L])."""
    B, S, L = blocks_t.shape
    pay = blocks_t[:, 1:, :].astype(jnp.uint32).reshape(B, 8, 4, L)
    w = (pay[:, :, 0] | (pay[:, :, 1] << 8) | (pay[:, :, 2] << 16)
         | (pay[:, :, 3] << 24))
    return blocks_t[:, 0, :], w.astype(jnp.int32)


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
    prof, words = pack_words(blocks_t)
    jax.block_until_ready(words)

    kw = dict(lane_tile=lane_tile, block_tile=block_tile, sublanes=sublanes)

    # correctness vs production kernel
    small = blocks_t[:8, :, :lane_tile]
    st_small = states0[:lane_tile]
    ref_pcm, ref_end = fused_decode_lanes(
        small, st_small, bits=bits, lane_tile=lane_tile,
        block_tile=block_tile, sublanes=sublanes)
    sp, sw = pack_words(small)
    got, got_end = decode_w32(sp, sw, st_small, store="i16", **kw)
    assert (np.asarray(got).reshape(8, 32, -1) == np.asarray(ref_pcm)).all()
    assert (np.asarray(got_end) == np.asarray(ref_end)).all()
    gp, gp_end = decode_w32(sp, sw, st_small, store="pair", **kw)
    pv = np.asarray(gp).view("<u4")
    lo = (pv & 0xFFFF).astype(np.uint16).view(np.int16)
    hi = (pv >> 16).astype(np.uint16).view(np.int16)
    rebuilt = np.stack([lo, hi], axis=2).reshape(8, BLOCK_SAMPLES, -1)
    assert (rebuilt == np.asarray(ref_pcm).reshape(8, 32, -1)).all()
    assert (np.asarray(gp_end) == np.asarray(ref_end)).all()
    print("w32 variants bit-exact ✓")

    def measure(store, T, reps=8):
        @jax.jit
        def chain(p, w, st, t):
            def body(_, carry):
                st, chk = carry
                out, end = decode_w32.__wrapped__(p, w, st, store=store,
                                                  **kw)
                st = end + (out[-1, -1].astype(jnp.int32).reshape(-1, 1)
                            >> 15)[:lanes]
                return st, chk + jnp.sum(end)
            st, chk = lax.fori_loop(0, t, body, (st, jnp.int32(0)))
            return chk

        int(chain(prof, words, states0, jnp.int32(T)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(prof, words, states0, jnp.int32(T)))
            best = min(best, time.perf_counter() - t0)
        return best

    samples_per_iter = lanes * nblocks * 32
    for store in ("i16", "pair"):
        d4 = measure(store, 4)
        d32 = measure(store, 32)
        rate = 28 * samples_per_iter / max(d32 - d4, 1e-9)
        print(f"w32+{store:4s}  {rate/1e9:.1f} Gsamp/s")


if __name__ == "__main__":
    main()
