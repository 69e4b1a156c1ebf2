"""Encode-kernel ablation: prove or beat the search kernel's ceiling.

Three variants of the Pallas search kernel, timed with the chained-slope
methodology (see bench.py) and cross-checked for identical profile
selections first:

* ``baseline``   — shipped kernel: ranges iterate as a ``fori_loop`` with
  vector-scalar shifts (ops/pallas_encode.py).
* ``specialized``— ranges unrolled at compile time: quantization shifts
  become immediates, the down/up select disappears, and the recon shift
  folds to one op (~3 fewer vector ops of ~20 per candidate-sample, at
  16x code size).
* ``gutted``     — candidate search deleted (same loads, same final
  re-run + stores): bounds the kernel's non-search overhead, so
  ``(full - gutted)`` is the pure 80-candidate search cost to compare
  against an issue-rate model.

Run manually on the TPU: python benchmarks/bench_encode_ablate.py
Env: BENCH_BITS/BENCH_BLOCKS/BENCH_LANES as bench_encode.py.
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
    from bjxa_tpu.ops.pallas_encode import encode_search_pallas_core, pick_tiles

    _enable_compile_cache()

    bits = int(os.environ.get("BENCH_BITS", "6"))
    B = int(os.environ.get("BENCH_BLOCKS", "32"))
    L = int(os.environ.get("BENCH_LANES", "4096"))
    lane_tile, block_tile = pick_tiles(L, B)

    pcm = random.randint(
        random.PRNGKey(0), (B, 32, L), -(2**15), 2**15, jnp.int32
    )
    st0 = jnp.zeros((L, 2), jnp.int32)

    # -- exactness first: specialized must pick identical profiles -------
    base = encode_search_pallas_core(
        pcm, st0, bits=bits, lane_tile=lane_tile, block_tile=block_tile
    )
    spec = encode_search_pallas_core(
        pcm, st0, bits=bits, lane_tile=lane_tile, block_tile=block_tile,
        specialize=True,
    )
    for a, b, name in zip(base, spec, ("prof", "coded", "recon", "end")):
        assert (np.asarray(a) == np.asarray(b)).all(), name

    def run_variant(**kw):
        @jax.jit
        def chain(x, st, T):
            def body(_, carry):
                st, chk = carry
                prof, coded, recon, end = encode_search_pallas_core(
                    x, st, bits=bits, lane_tile=lane_tile,
                    block_tile=block_tile, **kw,
                )
                st = (
                    end
                    + (recon[-1, -1, :].astype(jnp.int32)[:, None] >> 15)
                    + (coded[-1, -1, :].astype(jnp.int32)[:, None] >> 15)
                    + (prof[-1, :].astype(jnp.int32)[:, None] >> 15)
                )
                return st, chk + jnp.sum(end)

            _, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
            return chk

        def measure(T, reps=3):
            t_arr = jnp.int32(T)
            int(chain(pcm, st0, t_arr))
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                int(chain(pcm, st0, t_arr))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        # long chains: the gutted variant runs ~2 orders of magnitude
        # faster than the search, so short chains drown in tunnel noise
        d1, d2 = measure(4), measure(40)
        n = B * 32 * L
        return 36 * n / max(d2 - d1, 1e-9)

    rates = {
        "baseline": run_variant(),
        "specialized": run_variant(specialize=True),
        "gutted": run_variant(gut_search=True),
    }
    out = {
        "metric": "encode_ablation",
        "bits": bits,
        "blocks": B,
        "lanes": L,
        **{k: round(v / 1e6, 1) for k, v in rates.items()},
        "unit": "Msamples/s",
        "specialized_vs_baseline": round(
            rates["specialized"] / rates["baseline"], 3
        ),
        "search_share_of_time": round(
            1 - rates["baseline"] / rates["gutted"], 3
        ),
        "exact_match": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
