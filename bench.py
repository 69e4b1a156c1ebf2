"""Headline benchmark: XA decode throughput per chip, plus driver-visible
encode-kernel and corpus-engine metrics.

Prints one JSON line per metric, the decode headline LAST (the driver
parses the final line):

  {"metric": "encode_search_throughput", "value": <Msamples/s>, ...}
  {"metric": "corpus_decode_files_per_s", "value": <files/s>, ...}
  {"metric": "decode_throughput", "value": <Msamples/s>,
   "unit": "Msamples/s", "vs_baseline": <ratio>}

Baselines (BASELINE.md): the reference C library decodes ~100 Msamples/s
on one Xeon core and its CLI converts ~77 files/s disk-to-disk (measured
during the survey; the project publishes no numbers of its own).  The
reference's truncation-only encoder measures ~250 Msamples/s on the same
methodology (100 CLI encodes of the stereo fixture) — the search
encoder's vs_baseline is against that number while doing the 80-profile
exhaustive search the reference lacks.  BENCH_SKIP_EXTRAS=1 restores the
decode-only output.

Methodology: the workload is a large batch of 8-bit stereo streams decoded
by the full device pipeline — the fused Pallas kernel consuming the packed
little-endian-words layout the corpus engine stages (profile plane
uint8[B, L] + payload words int32[B, bits, L]), producing filtered PCM and
carried predictor state.  To measure the chip
rather than host/tunnel launch latency, T pipeline iterations are chained
inside one jit (each iteration's end state feeds the next, with a bounded
dependency on the PCM output so nothing can be hoisted or elided) and the
steady-state rate is the work/time *slope* between a short and a long
chain — launch overhead and data staging cancel out.  Each point is the
min over reps (the tunnel adds heavy-tailed noise).  Data is generated
on-device.
"""

from __future__ import annotations

import json
import os
import time


def bench_encode() -> None:
    """Search-encode kernel throughput (chained-slope, like the decode
    headline): all 80 candidate profiles evaluated per block with the
    real decode recurrence in the loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from bjxa_tpu.ops.encode import encode_search

    bits = int(os.environ.get("BENCH_ENC_BITS", "6"))
    B = int(os.environ.get("BENCH_ENC_BLOCKS", "32"))
    L = int(os.environ.get("BENCH_ENC_LANES", "4096"))
    t_short = int(os.environ.get("BENCH_T_SHORT", "4"))
    t_long = int(os.environ.get("BENCH_T_LONG", "32"))
    reps = int(os.environ.get("BENCH_REPS", "10"))

    @jax.jit
    def gen(key):
        return random.randint(key, (B, 32, L), -(2**15), 2**15, jnp.int32)

    pcm = gen(random.PRNGKey(3))
    st0 = jnp.zeros((L, 2), jnp.int32)
    jax.block_until_ready(pcm)

    @jax.jit
    def chain(x, st, T):
        def body(_, carry):
            st, chk = carry
            prof, coded, recon, end = encode_search(x, st, bits=bits)
            # bounded dependency on every output so nothing is elided
            while coded.ndim:
                coded = coded[-1]
            st = end + (coded.astype(jnp.int32) >> 15)
            chk = chk + jnp.sum(end) + jnp.sum(prof[-1])
            return st, chk

        st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
        return chk

    def measure(T):
        t_arr = jnp.int32(T)
        int(chain(pcm, st0, t_arr))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(pcm, st0, t_arr))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_short = measure(t_short)
    dt_long = measure(t_long)
    samples_per_iter = B * 32 * L
    slope = (t_long - t_short) * samples_per_iter / max(
        dt_long - dt_short, 1e-9
    )
    msps = slope / 1e6
    baseline_msps = 250.0  # reference truncation encoder, 1 Xeon core
    print(
        json.dumps(
            {
                "metric": "encode_search_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        ),
        flush=True,
    )


def bench_corpus() -> None:
    """Small disk-to-disk corpus decode: synthetic fixture-sized XA files
    through the full engine (parse, staging, device, WAV write,
    manifest), in files/s against the reference CLI's ~77 files/s."""
    import shutil
    import tempfile

    import numpy as np

    from bjxa_tpu.format import XAFormat, dump_xa_header
    from bjxa_tpu.parallel.corpus import decode_corpus

    bits = int(os.environ.get("BENCH_CORPUS_BITS", "8"))
    n_files = int(os.environ.get("BENCH_CORPUS_FILES", "32"))
    nblocks = int(os.environ.get("BENCH_CORPUS_BLOCKS", "20672"))
    batch_files = int(os.environ.get("BENCH_CORPUS_BATCH", "16"))
    size = bits * 4 + 1
    channels = 2

    rng = np.random.default_rng(11)
    xa_dir = tempfile.mkdtemp(prefix="bjxa_bench_xa_")
    wav_dir = tempfile.mkdtemp(prefix="bjxa_bench_wav_")
    try:
        fmt = XAFormat(
            data_len=nblocks * size * channels,
            samples=nblocks * 32,
            samples_rate=44100,
            bits=bits,
            channels=channels,
            initial_state=((0, 0), (0, 0)),
        )
        hdr = dump_xa_header(fmt)
        for i in range(n_files):
            body = rng.integers(
                0, 256, nblocks * channels * size, dtype=np.uint8
            ).reshape(nblocks * channels, size)
            body[:, 0] = (body[:, 0] & 0x0F) | (
                rng.integers(0, 5, nblocks * channels).astype(np.uint8) << 4
            )
            with open(f"{xa_dir}/f{i:04d}.xa", "wb") as f:
                f.write(hdr)
                f.write(body.tobytes())
        # untimed warm pass compiles the batch shapes (minutes through
        # the remote-compile tunnel on a cold cache); the timed pass
        # then measures the engine, not the compiler
        decode_corpus(xa_dir, wav_dir, batch_files=batch_files)
        shutil.rmtree(wav_dir, ignore_errors=True)
        os.makedirs(wav_dir, exist_ok=True)
        t0 = time.perf_counter()
        decode_corpus(xa_dir, wav_dir, batch_files=batch_files)
        dt = time.perf_counter() - t0
        files_s = n_files / dt
        msps = n_files * nblocks * 32 * channels / dt / 1e6
        # host<->device traffic per file: staged payload words up, PCM
        # down — the quantity the link actually carries, for the implied
        # sustained link rate alongside the files/s figure
        io_mb = (
            n_files
            * (nblocks * size * channels + nblocks * 32 * channels * 2)
            / 1e6
        )
        print(
            json.dumps(
                {
                    "metric": "corpus_decode_files_per_s",
                    "value": round(files_s, 2),
                    "unit": "files/s",
                    "msamples_per_s": round(msps, 1),
                    "link_mb_per_s": round(io_mb / dt, 1),
                    "vs_baseline": round(files_s / 77.0, 3),
                    "note": (
                        "end-to-end disk-to-disk incl. host<->device "
                        "transport; on a remote-TPU tunnel this is "
                        "link-bound (~20-90 MB/s sustained) while the "
                        "77 files/s baseline is the local C CLI — see "
                        "PERFORMANCE.md 'End-to-end corpus engine'"
                    ),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(xa_dir, ignore_errors=True)
        shutil.rmtree(wav_dir, ignore_errors=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from bjxa_tpu.cli import _enable_compile_cache
    from bjxa_tpu.ops.decode import decode_batch_words

    _enable_compile_cache()

    if not os.environ.get("BENCH_SKIP_EXTRAS"):
        # extra driver-visible metrics first; the decode headline must
        # stay the FINAL line (the driver parses the last line)
        for extra in (bench_encode, bench_corpus):
            try:
                extra()
            except Exception as e:  # pragma: no cover - keep the headline
                # alive on any extra-metric failure (e.g. no disk space)
                print(
                    json.dumps(
                        {"metric": f"{extra.__name__}_error", "error": str(e)}
                    ),
                    flush=True,
                )

    bits = int(os.environ.get("BENCH_BITS", "8"))
    n_files = int(os.environ.get("BENCH_FILES", "16384"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "64"))
    channels = 2
    t_short = int(os.environ.get("BENCH_T_SHORT", "4"))
    t_long = int(os.environ.get("BENCH_T_LONG", "32"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    size = bits * 4 + 1
    lanes = n_files * channels

    @jax.jit
    def gen(key):
        kd, kf, ks = random.split(key, 3)
        words = random.randint(
            kd,
            (nblocks, bits, lanes),
            jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max,
            jnp.int32,
        )
        factor = random.randint(kf, (nblocks, lanes), 0, 5)
        shift = random.randint(ks, (nblocks, lanes), 0, 16)
        prof = (factor << 4 | shift).astype(jnp.uint8)
        return prof, words

    prof, words = gen(random.PRNGKey(7))
    states0 = jnp.zeros((lanes, 2), jnp.int32)
    jax.block_until_ready(words)

    decode_core = decode_batch_words.__wrapped__

    @jax.jit
    def chain(p, w, st, T):  # T is a traced trip count: one compile for all T
        def body(_, carry):
            st, chk = carry
            pcm, end, valid = decode_core(p, w, st, bits=bits)
            # real (bounded) dependency on the sample output so the
            # pcm writes can't be dead-code-eliminated; scalar slice, not
            # a reshape — reshaping the tiled 4-D PCM would relayout-copy
            # the whole output every iteration
            while pcm.ndim:
                pcm = pcm[-1]
            st = end + (pcm.astype(jnp.int32) >> 15)
            chk = chk + jnp.sum(end)
            return st, chk
        st, chk = lax.fori_loop(0, T, body, (st, jnp.int32(0)))
        return chk

    def measure(T):
        t_arr = jnp.int32(T)
        int(chain(prof, words, states0, t_arr))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(prof, words, states0, t_arr))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_short = measure(t_short)
    dt_long = measure(t_long)
    samples_per_iter = lanes * nblocks * 32
    slope = (t_long - t_short) * samples_per_iter / max(
        dt_long - dt_short, 1e-9
    )
    msps = slope / 1e6
    baseline_msps = 100.0
    print(
        json.dumps(
            {
                "metric": "decode_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
