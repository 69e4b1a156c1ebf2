"""Single-stream search-encode: sequential vs chunk-parallel fixpoint,
as a function of the measured link round trip.

The fixpoint (``ops/encode.py::encode_search_fixpoint``) trades one
B-row serial kernel for ``rounds x (B/K)``-row kernels over ``K*C``
lanes, paying a dispatch + end-state D2H sync per round — so the winner
is decided by the link, not the workload.  This benchmark measures both
paths on the current backend plus the probed dispatch RTT
(``ops/encode.py::link_rtt_us``), validating the adaptive default's
cutoff (``FIXPOINT_RTT_CUTOFF_US``).

Run manually from the repo root: python benchmarks/bench_fixpoint_link.py
(BENCH_BLOCKS / BENCH_CHANNELS / BENCH_BITS override the shape).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # Honor BJXA_PLATFORM (a bare JAX_PLATFORMS env override does not
    # stick on hosts whose plugin registers itself first — same dance as
    # cli.main).
    plat = os.environ.get("BJXA_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    import numpy as np

    from bjxa_tpu.ops.encode import (
        FIXPOINT_RTT_CUTOFF_US,
        encode_search,
        encode_search_fixpoint,
        fixpoint_default_on,
        link_rtt_us,
        pick_encode_chunks,
    )

    import jax
    import jax.numpy as jnp

    bits = int(os.environ.get("BENCH_BITS", "6"))
    B = int(os.environ.get("BENCH_BLOCKS", "8192"))
    C = int(os.environ.get("BENCH_CHANNELS", "2"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    rng = np.random.default_rng(0)
    t = np.linspace(0, 400 * np.pi, B * 32 * C)
    pcm = (
        (11000 * np.sin(t) + rng.integers(-2500, 2500, t.size))
        .astype(np.int32).reshape(B, 32, C)
    )
    st0 = np.zeros((C, 2), np.int32)

    rtt = link_rtt_us()
    out = {
        "backend": jax.default_backend(),
        "blocks": B,
        "channels": C,
        "bits": bits,
        "link_rtt_us": round(rtt, 1),
        "rtt_cutoff_us": FIXPOINT_RTT_CUTOFF_US,
    }

    # -- sequential greedy search (one B-row kernel) --------------------
    def run_seq():
        prof, coded, recon, end = encode_search(
            jnp.asarray(pcm), jnp.asarray(st0), bits=bits
        )
        jax.block_until_ready((prof, coded, recon, end))

    run_seq()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_seq()
        ts.append(time.perf_counter() - t0)
    seq_s = min(ts)
    out["sequential_s"] = round(seq_s, 4)

    # -- chunk-parallel fixpoint at the auto K --------------------------
    os.environ["BJXA_ENCODE_FIXPOINT_CHUNKS"] = "auto"
    try:
        K = pick_encode_chunks(B, C)
    finally:
        del os.environ["BJXA_ENCODE_FIXPOINT_CHUNKS"]
    out["auto_chunks"] = K

    def run_fix():
        return encode_search_fixpoint(pcm, st0, bits=bits, num_chunks=K)

    *_, rounds = run_fix()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_fix()
        ts.append(time.perf_counter() - t0)
    fix_s = min(ts)
    out["fixpoint_s"] = round(fix_s, 4)
    out["fixpoint_rounds"] = int(rounds)
    out["fixpoint_speedup"] = round(seq_s / fix_s, 2)
    picks = fixpoint_default_on()
    out["adaptive_default_picks_fixpoint"] = picks
    out["adaptive_default_correct"] = (fix_s < seq_s) == picks

    print(json.dumps(out))


if __name__ == "__main__":
    main()
