"""Burst vs sustained link rate: the corpus 'utilization deficit' resolved.

Rounds 2-3 computed corpus link utilization against min-of-reps probe
bandwidth and saw an unexplained ~25-30% in-engine transfer-rate deficit.
This probe shows the deficit is PROBE OPTIMISM: the tunnel's min-of-3
burst rate exceeds what it sustains on back-to-back batch-sized
transfers (v5e run, 42.3 MB D2H transfers):

    probe min-of-3:           44.0 MB/s
    8 back-to-back transfers: 29.8-34.4 MB/s each, mean 31.8 MB/s (72%)
    duplex pairs (42.3 MB D2H + 21.8 MB H2D concurrently):
                              1.21-1.83 s/pair -> ~30-35 MB/s D2H-equiv

The corpus engine moves a batch's PCM down while the next batch's words
ride up — exactly the duplex-pair pattern — so its roofline is the
SUSTAINED duplex rate, not the burst probe.  Against that floor the
round-4 engine runs at ~76% (best) / ~64% (median), with the remainder
in pipeline fill/drain and the ~15-24 ms per-batch fixed costs that
`benchmarks/bench_corpus.py` now fits separately via its transfer-size
ramp.

Run manually from the repo root: python tools/link_sustain_probe.py
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

    N = 16 * 2 * 661504  # batch-sized int16 PCM (42.3 MB)
    base = jnp.zeros(N, jnp.int16)

    def one(tag):
        # a fresh device array per transfer — rereading one array returns
        # the runtime's cached host copy and measures nothing
        buf = (base + tag).block_until_ready()
        t = time.perf_counter()
        np.asarray(buf)
        return time.perf_counter() - t

    probe = min(one(100 + r) for r in range(3))
    ts = [one(200 + r) for r in range(8)]

    host = np.zeros(16 * 2 * 20672 * 33, np.uint8)  # 21.8 MB staged batch
    pairs = []
    for r in range(6):
        buf = (base + 300 + r).block_until_ready()
        host[0] = r
        t = time.perf_counter()
        fut = jax.device_put(host)
        np.asarray(buf)
        fut.block_until_ready()
        pairs.append(time.perf_counter() - t)

    print(
        json.dumps(
            {
                "burst_min3_mb_s": round(N * 2 / probe / 1e6, 1),
                "sustained_each_mb_s": [
                    round(N * 2 / t / 1e6, 1) for t in ts
                ],
                "sustained_mean_mb_s": round(
                    N * 2 * len(ts) / sum(ts) / 1e6, 1
                ),
                "duplex_pair_s": [round(t, 2) for t in pairs],
                "duplex_d2h_equiv_mb_s": round(
                    N * 2 / min(pairs) / 1e6, 1
                ),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
