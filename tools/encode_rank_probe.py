"""Quantify the search encoder's float32 ranking contract.

The 80-candidate profile search accumulates per-block reconstruction error
energy in float32, in sample order, in all three implementations
(``ops/encode.py:162-168``, ``ops/pallas_encode.py``,
``native/bjxa_host.cc``).  Block energy can reach ``32 * 65535**2 ~ 1.4e11``
— far past float32's 24-bit mantissa — so candidates whose exact (int64)
energies differ by less than one f32 ulp can be ranked either way.  This
probe measures how often that matters:

* simulates every candidate with exact integer semantics (the same
  recurrence the decoder runs), accumulating error BOTH ways;
* counts blocks where the f32 argmin differs from the int64 argmin, at
  amplitudes from quiet audio to adversarial full-scale noise;
* reports the exact-energy regret of the f32 pick (how much worse the
  chosen candidate is, in exact energy, than the true minimum).

Conclusion recorded in ``docs/bjxa-tpu.3.md`` ("Encoder profile-search
ranking contract"): divergence exists only in adversarial full-scale noise
(never in scaled audio-like signals), the regret is within f32 rounding of
a tie, and all three implementations agree bit-for-bit with each other —
so the shipped contract is "minimum error under float32 accumulation in
candidate order", pinned by ``tests/test_encode.py::test_rank_contract_*``.

Usage: ``python tools/encode_rank_probe.py [--blocks N] [--bits B]``
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from bjxa_tpu.ops.tables import (  # noqa: E402
    BLOCK_SAMPLES,
    GAIN_K0,
    GAIN_K1,
    INT16_MAX,
    INT16_MIN,
    NUM_FACTORS,
    NUM_RANGES,
)


def candidate_errors(x, p0, p1, bits):
    """Exact per-candidate simulation of one block for one lane.

    ``x``: int [32] target samples.  Returns ``(err_f32[80], err_i64[80])``
    with f32 accumulated in sample order exactly as the device encoders do.
    """
    shq = 16 - bits
    qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    err32 = np.zeros(NUM_FACTORS * NUM_RANGES, np.float32)
    err64 = np.zeros(NUM_FACTORS * NUM_RANGES, np.int64)
    for factor in range(NUM_FACTORS):
        k0, k1 = int(GAIN_K0[factor]), int(GAIN_K1[factor])
        for r in range(NUM_RANGES):
            c = factor * NUM_RANGES + r
            a0, a1 = int(p0), int(p1)
            sh_down = max(shq - r, 0)
            sh_up = max(r - shq, 0)
            bias = (1 << sh_down) >> 1
            for n in range(BLOCK_SAMPLES):
                g = a0 * k0 + a1 * k1
                pred = (g + ((g >> 31) & 255)) >> 8  # trunc toward zero
                diff = int(x[n]) - pred
                if r <= shq:
                    q = (diff + bias) >> sh_down
                else:
                    q = diff << sh_up
                q = min(max(q, qmin), qmax)
                d = q << shq
                recon = min(max((d >> r) + pred, INT16_MIN), INT16_MAX)
                e = int(x[n]) - recon
                err32[c] = err32[c] + np.float32(e) * np.float32(e)
                err64[c] += e * e
                a1, a0 = a0, recon
    return err32, err64


def candidate_errors_batch(x, p0, p1, bits):
    """Vectorized exact simulation: ``x int[N, 32]``, states ``int[N]``.

    Returns ``(err_f32[N, 80], err_i64[N, 80])`` — identical semantics to
    :func:`candidate_errors`, evaluated for all N blocks and all 80
    candidates at once (int64 throughout, so no intermediate overflows).
    """
    N = x.shape[0]
    factor = np.repeat(np.arange(NUM_FACTORS), NUM_RANGES)
    rr = np.tile(np.arange(NUM_RANGES), NUM_FACTORS)
    k0 = GAIN_K0[factor].astype(np.int64)[None, :]
    k1 = GAIN_K1[factor].astype(np.int64)[None, :]
    shq = 16 - bits
    qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    sh_down = np.maximum(shq - rr, 0)[None, :]
    sh_up = np.maximum(rr - shq, 0)[None, :]
    bias = (1 << sh_down) >> 1
    use_down = (rr <= shq)[None, :]
    rrb = rr[None, :]
    a0 = np.broadcast_to(
        np.asarray(p0, np.int64)[:, None], (N, factor.size)
    ).copy()
    a1 = np.broadcast_to(
        np.asarray(p1, np.int64)[:, None], (N, factor.size)
    ).copy()
    err32 = np.zeros((N, factor.size), np.float32)
    err64 = np.zeros((N, factor.size), np.int64)
    xs = np.asarray(x, np.int64)
    for n in range(BLOCK_SAMPLES):
        g = a0 * k0 + a1 * k1
        pred = (g + ((g >> 63) & 255)) >> 8
        diff = xs[:, n : n + 1] - pred
        q = np.where(use_down, (diff + bias) >> sh_down, diff << sh_up)
        q = np.clip(q, qmin, qmax)
        recon = np.clip(((q << shq) >> rrb) + pred, INT16_MIN, INT16_MAX)
        e = xs[:, n : n + 1] - recon
        ef = e.astype(np.float32)
        err32 = err32 + ef * ef
        err64 = err64 + e * e
        a1, a0 = a0, recon
    return err32, err64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=20000)
    ap.add_argument("--bits", type=int, default=6, choices=(4, 6, 8))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--check", type=int, default=0,
        help="cross-check N blocks of the vectorized path vs the scalar one",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    if args.check:
        for _ in range(args.check):
            x = rng.integers(-32768, 32768, size=(1, BLOCK_SAMPLES))
            p0 = rng.integers(-32768, 32768, size=1)
            p1 = rng.integers(-32768, 32768, size=1)
            b32, b64 = candidate_errors_batch(x, p0, p1, args.bits)
            s32, s64 = candidate_errors(x[0], int(p0[0]), int(p1[0]),
                                        args.bits)
            assert (b64[0] == s64).all()
            assert (b32[0] == s32).all()
        print(f"scalar/vectorized cross-check OK ({args.check} blocks)")

    regimes = {
        "quiet (|x|<2k)": 2_000,
        "audio (|x|<16k)": 16_000,
        "loud (|x|<28k)": 28_000,
        "full-scale noise": 32_768,
    }
    print(f"bits={args.bits} blocks/regime={args.blocks}")
    example = None
    for name, amp in regimes.items():
        diverged = 0
        worst_regret = 0.0
        min_rel_gap = np.inf
        chunk = 2048
        left = args.blocks
        while left > 0:
            n = min(chunk, left)
            left -= n
            x = rng.integers(-amp, amp, size=(n, BLOCK_SAMPLES))
            p0 = rng.integers(-amp, amp, size=n)
            p1 = rng.integers(-amp, amp, size=n)
            e32, e64 = candidate_errors_batch(x, p0, p1, args.bits)
            a32 = np.argmin(e32, axis=1)
            a64 = np.argmin(e64, axis=1)
            # top-2 exact gap relative to the winner (the tie margin f32
            # rounding would have to bridge to flip the ranking)
            part = np.partition(e64, 1, axis=1)
            gap = (part[:, 1] - part[:, 0]) / np.maximum(part[:, 0], 1)
            min_rel_gap = min(min_rel_gap, float(gap.min()))
            bad = np.nonzero(a32 != a64)[0]
            diverged += bad.size
            for i in bad:
                regret = (e64[i, a32[i]] - e64[i, a64[i]]) / max(
                    float(e64[i, a64[i]]), 1.0
                )
                worst_regret = max(worst_regret, regret)
                if example is None:
                    example = (name, x[i].tolist(), int(p0[i]), int(p1[i]),
                               int(a32[i]), int(a64[i]),
                               int(e64[i, a32[i]]), int(e64[i, a64[i]]))
        print(
            f"  {name:18s} divergence {diverged}/{args.blocks}"
            f"  worst regret {worst_regret:.2e}"
            f"  min top-2 exact rel gap {min_rel_gap:.2e}"
            f"  (f32 eps {np.finfo(np.float32).eps:.1e})"
        )
    if example is not None:
        name, x, p0, p1, a32, a64, v32, v64 = example
        print(f"\nfirst divergent block ({name}):")
        print(f"  state p0={p0} p1={p1}")
        print(f"  x = {x}")
        print(
            f"  f32 pick cand {a32} (exact {v32}),"
            f" int64 pick cand {a64} (exact {v64}),"
            f" rel gap {(v32 - v64) / max(v64, 1):.2e}"
        )
    else:
        print("\nno divergent block found")


if __name__ == "__main__":
    main()
