"""Why packed-int16 two-candidates-per-vreg encode evaluation cannot work.

ROADMAP round-3 lead #2 proposed evaluating two search candidates per
int32 vreg by packing their lanes as 2 x int16, for a potential ~2x on the
issue-bound 80-candidate sweep.  This script records the two measurements
that close the lead (same contract as ``encode_prune_falsify.py``: try it
or name the obstruction with numbers).

1. **Semantic obstruction (measured, numpy)** — the candidate recurrence's
   intermediates do not fit int16:

   * ``g = a0*k0 + a1*k1`` spans +-23.9M (25 bits) — the products cannot
     even be FORMED in 16-bit lanes (no 16x16->32 dual multiply exists on
     the VPU; a low-half multiply wraps);
   * ``pred = trunc(g/256)`` spans +-93k (18 bits) and ``diff = x - pred``
     +-125k (18 bits); C semantics clamp only at ``recon``, so these must
     survive unclamped between ops.

   The script measures, per signal regime, how often ``|pred|`` / ``|diff|``
   actually exceed int16 on random blocks, then simulates the two possible
   16-bit repairs — saturating each intermediate, or wrapping it — and
   counts blocks whose chosen profile diverges from the exact search.
   Both repairs diverge at double-digit percentages on loud content, so a
   packed evaluation is not byte-compatible, not merely risky.

2. **Compiler obstruction (measured on TPU, --bench)** — the premise that
   int16 lanes exist as a compute substrate is false on this toolchain:
   Mosaic FAILS TO LEGALIZE the candidate op mix on packed
   ``vector<8x128x2xi16>`` lanes — ``arith.shrsi`` (the 4+ shifts per
   candidate-sample), ``arith.maxsi`` (the clips), and even the bare
   mul+add mix all abort compilation (transcript below from a v5e run).
   Packed int16 vregs are a storage format on this hardware, not an ALU
   mode; there is no kernel to benchmark, let alone a 2x one.

Conclusion (recorded in ROADMAP.md): the lead is closed as IMPOSSIBLE —
semantically (intermediates need 18-25 bits and diverge at 54-91% of
blocks under any 16-bit repair) and mechanically (the ops do not
legalize in 16-bit lanes).  Encode speedups must come from fewer ops per
candidate-sample.

Run: ``python tools/encode_pack_falsify.py``          (semantic part)
     ``python tools/encode_pack_falsify.py --bench``  (TPU rate ratio)
"""

from __future__ import annotations

import sys

import numpy as np

GK0 = np.array([0, 240, 460, 392, 488], np.int64)
GK1 = np.array([0, 0, -208, -220, -240], np.int64)
I16MIN, I16MAX = -32768, 32767


def _sat16(x):
    return np.clip(x, I16MIN, I16MAX)


def _wrap16(x):
    return ((np.asarray(x, np.int64) + 32768) & 0xFFFF) - 32768


def candidate_block(x, p0, p1, bits, factor, r, mode):
    """One candidate's exact/sat16/wrap16 block error + end state.

    ``mode``: 'exact' keeps full-width intermediates (the C semantics);
    'sat16' saturates g/pred/diff to int16 after each op (what saturating
    packed lanes would compute); 'wrap16' wraps them (what plain packed
    lanes would compute).
    """
    shq = 16 - bits
    qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    sd, su = max(shq - r, 0), max(r - shq, 0)
    bias = (1 << sd) >> 1
    k0, k1 = int(GK0[factor]), int(GK1[factor])
    fix = {"exact": lambda v: v, "sat16": _sat16, "wrap16": _wrap16}[mode]
    a0, a1 = np.asarray(p0, np.int64), np.asarray(p1, np.int64)
    err = np.zeros(np.shape(p0), np.float32)
    over_pred = 0
    over_diff = 0
    for n in range(32):
        g = fix(a0 * k0) + fix(a1 * k1) if mode != "exact" else (
            a0 * k0 + a1 * k1
        )
        g = fix(g)
        pred = (g + ((g >> 63) & 255)) >> 8
        over_pred += int(np.sum((pred > I16MAX) | (pred < I16MIN)))
        pred = fix(pred)
        diff = x[n] - pred
        over_diff += int(np.sum((diff > I16MAX) | (diff < I16MIN)))
        diff = fix(diff)
        q = (diff + bias) >> sd if r <= shq else diff << su
        q = np.clip(q, qmin, qmax)
        recon = np.clip(((q << shq) >> r) + pred, I16MIN, I16MAX)
        e = (x[n] - recon).astype(np.float32)
        err = err + e * e
        a1, a0 = a0, recon
    return err, over_pred, over_diff


def semantic_report(blocks=600, seed=0, bits=6):
    rng = np.random.default_rng(seed)
    regimes = {
        "quiet (|x|<2k)": 2_000,
        "audio (|x|<16k)": 16_000,
        "full-scale": 32_768,
    }
    print(f"bits={bits}, {blocks} random blocks per regime, 80 candidates")
    for name, amp in regimes.items():
        x = rng.integers(-amp, amp, size=(32, blocks))
        p0 = rng.integers(-amp, amp, size=blocks)
        p1 = rng.integers(-amp, amp, size=blocks)
        errs = {m: np.zeros((80, blocks), np.float32)
                for m in ("exact", "sat16", "wrap16")}
        opred = odiff = 0
        for factor in range(5):
            for r in range(16):
                c = factor * 16 + r
                for mode in errs:
                    e, op_, od_ = candidate_block(
                        x, p0, p1, bits, factor, r, mode
                    )
                    errs[mode][c] = e
                    if mode == "exact":
                        opred += op_
                        odiff += od_
        a_exact = np.argmin(errs["exact"], axis=0)
        div_sat = int(np.sum(np.argmin(errs["sat16"], axis=0) != a_exact))
        div_wrap = int(np.sum(np.argmin(errs["wrap16"], axis=0) != a_exact))
        tot = 32 * blocks * 80
        print(
            f"  {name:16s} |pred|>int16 {opred/tot:7.2%} of cand-samples,"
            f" |diff|>int16 {odiff/tot:7.2%};"
            f" profile divergence: sat16 {div_sat}/{blocks},"
            f" wrap16 {div_wrap}/{blocks}"
        )


def bench_int16_vs_int32():
    """Per-element ALU rate of the candidate op mix: int16 vs int32."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    STEPS = 256

    def kernel(x_ref, o_ref, *, dtype, mix):
        x = x_ref[...]
        y = x
        one = jnp.asarray(1, dtype)
        for _ in range(STEPS):
            if mix == "full":
                # the real candidate op mix needs 4+ shifts + clips
                y = (y * jnp.asarray(3, dtype) + x) >> 2
                y = jnp.clip(y + one, -16384, 16383).astype(dtype)
            elif mix == "clip":
                y = y * jnp.asarray(3, dtype) + x
                y = jnp.clip(y + one, -16384, 16383).astype(dtype)
            else:  # "muladd"
                y = y * jnp.asarray(3, dtype) + x + one
        o_ref[...] = y

    @partial(jax.jit, static_argnames=("dtype", "mix"))
    def run(x, T, *, dtype, mix):
        def body(_, y):
            return pl.pallas_call(
                partial(kernel, dtype=dtype, mix=mix),
                out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
            )(y)

        return lax.fori_loop(0, T, body, x)

    shape = (512, 1024)  # same ELEMENT count for both dtypes
    results = {}
    for dtype in (jnp.int32, jnp.int16):
        name = jnp.dtype(dtype).name
        for mix in ("full", "clip", "muladd"):
            x = jnp.ones(shape, dtype)
            try:
                run(x, 1, dtype=dtype, mix=mix).block_until_ready()
            except Exception as e:  # noqa: BLE001 - report and move on
                msg = str(e).splitlines()[0][:90]
                print(f"  {name} {mix:6s}: DOES NOT LEGALIZE ({msg})")
                continue

            def measure(T, reps=3):
                run(x, T, dtype=dtype, mix=mix).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(reps):
                    run(x, T, dtype=dtype, mix=mix).block_until_ready()
                return (time.perf_counter() - t0) / reps

            d1, d5 = measure(2), measure(10)
            per_iter = max((d5 - d1) / 8, 1e-9)
            n_ops = shape[0] * shape[1] * STEPS
            rate = n_ops / per_iter / 1e9
            results[(name, mix)] = rate
            print(f"  {name} {mix:6s}: {rate:.0f} Gelem-steps/s")
    for mix in ("full", "clip", "muladd"):
        if ("int16", mix) in results and ("int32", mix) in results:
            r = results[("int16", mix)] / results[("int32", mix)]
            print(
                f"  int16/int32 rate ratio ({mix}): {r:.2f}x"
                f" (packing premise needs ~2x)"
            )


if __name__ == "__main__":
    if "--bench" in sys.argv:
        bench_int16_vs_int32()
    else:
        semantic_report()
