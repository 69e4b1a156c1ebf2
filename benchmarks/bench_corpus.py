"""End-to-end corpus decode benchmark: XA files on disk -> WAV files on disk.

Measures the whole engine — header parse, host lane-major staging, device
transfer, fused-kernel decode, WAV serialization, manifest bookkeeping —
in files/s and Msamples/s, directly comparable to the reference CLI's
measured ~77 files/s (stereo 8-bit, 1.32 Msamples/file, one Xeon core;
BASELINE.md).

Not the driver headline bench; run manually:
    python benchmarks/bench_corpus.py
Env: BENCH_FILES (default 64), BENCH_BLOCKS (default 20672 blocks
~ 0.66 Msamples/channel, the fixture size), BENCH_BITS (default 8).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from bjxa_tpu.cli import _enable_compile_cache
    from bjxa_tpu.format import XAFormat, dump_xa_header
    from bjxa_tpu.parallel.corpus import decode_corpus

    # shapes compile once ever, not once per bench run (the remote
    # compile service behind the tunnel costs minutes per shape)
    _enable_compile_cache()

    bits = int(os.environ.get("BENCH_BITS", "8"))
    n_files = int(os.environ.get("BENCH_FILES", "64"))
    nblocks = int(os.environ.get("BENCH_BLOCKS", "20672"))
    # 16 files x ~2.6 MB PCM per batch: large enough that the ~24 ms
    # fixed per-transfer round trip (tools/link_probe.py) is noise
    batch_files = int(os.environ.get("BENCH_BATCH_FILES", "16"))
    channels = 2
    size = bits * 4 + 1

    rng = np.random.default_rng(7)
    work = tempfile.mkdtemp(prefix="bjxa-bench-corpus-")
    src = os.path.join(work, "xa")
    dst = os.path.join(work, "wav")
    os.makedirs(src)

    samples = nblocks * 32
    data_len = nblocks * size * channels
    hdr = dump_xa_header(
        XAFormat(
            data_len=data_len,
            samples=samples,
            samples_rate=44100,
            bits=bits,
            channels=channels,
            initial_state=((0, 0), (0, 0)),
        )
    )
    t_gen0 = time.perf_counter()
    for i in range(n_files):
        body = rng.integers(
            0, 256, size=(nblocks, channels, size), dtype=np.uint8
        )
        body[:, :, 0] = (
            rng.integers(0, 5, size=(nblocks, channels)) << 4
            | rng.integers(0, 13, size=(nblocks, channels))
        ).astype(np.uint8)
        with open(os.path.join(src, f"f{i:05d}.xa"), "wb") as f:
            f.write(hdr)
            f.write(body.tobytes())
    gen_s = time.perf_counter() - t_gen0

    # warm the compile cache with one batch-shaped run, then time fresh.
    # The tunnel's bandwidth swings ~2x between runs, so the timed run
    # repeats and the best sustained pass is reported, with the link
    # measured before AND after (its fastest observation = capability).
    decode_corpus(src, dst, batch_files=batch_files,
                  manifest_path=os.path.join(work, "warm.jsonl"))
    shutil.rmtree(dst)

    # --- link probe (see the ablation block below for the rationale) ----
    import jax
    import jax.numpy as jnp

    base = jnp.zeros(batch_files * channels * samples, jnp.int16)
    host_buf = np.zeros(base.size, np.int16)

    def probe_link(tag):
        down, up = [], []
        for r in range(3):
            # a fresh device array per rep — rereading one array returns
            # the runtime's cached host copy and measures nothing
            buf = (base + r + tag).block_until_ready()
            t = time.perf_counter()
            np.asarray(buf)
            down.append(time.perf_counter() - t)
            host_buf[0] = r + tag  # fresh host bytes: defeat dedup
            t = time.perf_counter()
            jax.device_put(host_buf).block_until_ready()
            up.append(time.perf_counter() - t)
        nbytes = base.size * 2
        return nbytes / min(down) / 1e6, nbytes / min(up) / 1e6

    d1, u1 = probe_link(100)

    dt = None
    for rep in range(int(os.environ.get("BENCH_REPS", "2"))):
        t0 = time.perf_counter()
        res = decode_corpus(
            src, dst, batch_files=batch_files,
            manifest_path=os.path.join(work, f"timed{rep}.jsonl"),
        )
        d = time.perf_counter() - t0
        dt = d if dt is None else min(dt, d)
        assert res.converted == n_files, res
        shutil.rmtree(dst)
    total_samples = n_files * samples * channels
    wav_bytes = total_samples * 2 + n_files * 44

    # --- link ablation: raw host<->device bandwidth ----------------------
    # The corpus engine ships the XA payload up and 4-8x that back down as
    # PCM; on a thin serialized link (this environment's ~tens-of-MB/s
    # tunnel; PCIe on a real host) the roofline is
    #     dt_min = bytes_up/up_bw + bytes_down/down_bw
    # and utilization = dt_min/dt tells whether the engine or the link is
    # the idle party.
    # capability = fastest observation across two probes bracketing the
    # timed runs; using the faster link makes the utilization claim
    # conservative (smaller roofline numerator)
    d2, u2 = probe_link(200)
    down_mb_s = max(d1, d2)
    up_mb_s = max(u1, u2)
    xa_bytes = n_files * (32 + data_len)
    up_s = xa_bytes / 1e6 / up_mb_s
    down_s = wav_bytes / 1e6 / down_mb_s
    # serialized roofline: every byte waits its turn on a half-duplex
    # link; duplex roofline: uploads ride under downloads (the tunnel is
    # substantially full-duplex per tools/link_probe.py), so the floor is
    # the bigger direction alone
    dt_min = up_s + down_s
    dt_min_duplex = max(up_s, down_s)
    corpus_mb_s = wav_bytes / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "corpus_decode_files_per_s",
                "value": round(n_files / dt, 1),
                "unit": "files/s",
                "msamples_per_s": round(total_samples / dt / 1e6, 1),
                "files": n_files,
                "samples_per_file": samples * channels,
                "gen_s": round(gen_s, 1),
                "link_down_mb_per_s": round(down_mb_s, 1),
                "link_up_mb_per_s": round(up_mb_s, 1),
                "corpus_mb_out_per_s": round(corpus_mb_s, 1),
                "link_roofline_s": round(dt_min, 2),
                "link_utilization": round(dt_min / dt, 3),
                "duplex_roofline_s": round(dt_min_duplex, 2),
                "duplex_utilization": round(dt_min_duplex / dt, 3),
                "actual_s": round(dt, 2),
                "backend": jax.default_backend(),
                "vs_baseline": round((n_files / dt) / 77.0, 2),
            }
        )
    )
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
