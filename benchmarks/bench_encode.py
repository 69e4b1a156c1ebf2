"""Encoder throughput benchmark (profile-search encode, samples/s).

Chained-slope methodology like bench.py. Not the driver headline bench;
run manually: python benchmarks/bench_encode.py
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax, jax.numpy as jnp
    from jax import lax, random
    from bjxa_tpu.ops.encode import encode_search

    bits = int(os.environ.get("BENCH_BITS", "6"))
    B = int(os.environ.get("BENCH_BLOCKS", "32"))
    L = int(os.environ.get("BENCH_LANES", "4096"))

    @jax.jit
    def gen(key):
        return random.randint(key, (B, 32, L), -(2**15), 2**15, jnp.int32)

    pcm = gen(random.PRNGKey(0))
    st0 = jnp.zeros((L, 2), jnp.int32)

    @jax.jit
    def chain(x, st, T):
        def body(_, carry):
            st, chk = carry
            prof, coded, recon, end = encode_search(x, st, bits=bits)
            st = end + (recon[-1, -1, :].astype(jnp.int32)[:, None] >> 15) \
                     + (coded[-1, -1, :].astype(jnp.int32)[:, None] >> 15) \
                     + (prof[-1, :].astype(jnp.int32)[:, None] >> 15)
            return st, chk + jnp.sum(end)
        st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
        return chk

    def measure(T, reps=3):
        t_arr = jnp.int32(T)
        int(chain(pcm, st0, t_arr))
        t0 = time.perf_counter()
        for _ in range(reps):
            int(chain(pcm, st0, t_arr))
        return (time.perf_counter() - t0) / reps

    d1, d2 = measure(1), measure(5)
    n = B * 32 * L
    rate = 4 * n / max(d2 - d1, 1e-9)
    print(json.dumps({
        "metric": "encode_search_throughput",
        "value": round(rate / 1e6, 1),
        "unit": "Msamples/s",
    }))


if __name__ == "__main__":
    main()
