"""Decode-kernel store ablation: int16 stores vs paired-int32 stores.

ROADMAP lead 1: the decode kernel is load/store-issue-bound (the r2
ablation proved the recurrence free); the words layout thinned the loads,
the PCM stores remain 32 int16 writes per block.  ``pack_out`` stores two
consecutive samples as one little-endian int32 word — half the stores,
+2 pack ops per pair.  This bench verifies the packed output's byte image
equals the int16 stream (pair-axis view) and measures both variants with
the chained-slope methodology at the headline shape.

Run manually on the TPU: python benchmarks/bench_pack_store.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax, random

    from bjxa_tpu.cli import _enable_compile_cache
    from bjxa_tpu.ops.pallas_decode import fused_decode_words

    _enable_compile_cache()

    bits = int(os.environ.get("BENCH_BITS", "8"))
    lanes = int(os.environ.get("BENCH_LANES", "32768"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    sublanes, lane_tile, block_tile = 32, 8192, 4

    kd, kf, ks = random.split(random.PRNGKey(7), 3)
    words = random.randint(
        kd, (nblocks, bits, lanes), jnp.iinfo(jnp.int32).min,
        jnp.iinfo(jnp.int32).max, jnp.int32,
    )
    prof = (
        random.randint(kf, (nblocks, lanes), 0, 5) << 4
        | random.randint(ks, (nblocks, lanes), 0, 16)
    ).astype(jnp.uint8)
    st0 = jnp.zeros((lanes, 2), jnp.int32)

    kw = dict(bits=bits, lane_tile=lane_tile, block_tile=block_tile,
              sublanes=sublanes)

    # -- exactness: packed bytes == int16 stream ------------------------
    ref_pcm, ref_end = fused_decode_words(prof, words, st0, **kw)
    pk_pcm, pk_end = fused_decode_words(prof, words, st0, pack_out=True,
                                        **kw)
    r = np.asarray(ref_pcm)  # int16[B, 32, sub, LN]
    p = np.asarray(pk_pcm)  # int32[B, 16, sub, LN]
    B, _, sub, LN = r.shape
    # int32 word w of (b, sub, LN) = samples (2w, 2w+1): view + transpose
    pv = p.view("<i2").reshape(B, 16, sub, LN, 2).transpose(0, 1, 4, 2, 3)
    np.testing.assert_array_equal(pv.reshape(r.shape), r)
    np.testing.assert_array_equal(np.asarray(pk_end), np.asarray(ref_end))

    def run_variant(pack_out):
        @jax.jit
        def chain(p_, w_, st, T):
            def body(_, carry):
                st, chk = carry
                pcm, end = fused_decode_words(
                    p_, w_, st, pack_out=pack_out, **kw
                )
                while pcm.ndim:
                    pcm = pcm[-1]
                st = end + (pcm.astype(jnp.int32) >> 30)
                return st, chk + jnp.sum(end)

            _, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
            return chk

        def measure(T):
            t_arr = jnp.int32(T)
            int(chain(prof, words, st0, t_arr))
            best = float("inf")
            for _ in range(8):
                t0 = time.perf_counter()
                int(chain(prof, words, st0, t_arr))
                best = min(best, time.perf_counter() - t0)
            return best

        d1, d2 = measure(4), measure(32)
        n = lanes * nblocks * 32
        return 28 * n / max(d2 - d1, 1e-9)

    r16 = run_variant(False)
    r32 = run_variant(True)
    print(
        json.dumps(
            {
                "metric": "decode_store_ablation",
                "bits": bits,
                "lanes": lanes,
                "int16_stores_msps": round(r16 / 1e6, 1),
                "packed_int32_stores_msps": round(r32 / 1e6, 1),
                "packed_vs_baseline": round(r32 / r16, 3),
                "exact_match": True,
            }
        )
    )


if __name__ == "__main__":
    main()
