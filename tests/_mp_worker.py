"""Subprocess worker for the real multi-process corpus tests.

Launched by ``tests/test_distributed.py`` with a JSON config argv.  Each
worker is a genuinely separate OS process that joins the job through
``jax.distributed`` (local coordinator, gloo CPU collectives), runs its
auto-derived shard of the corpus, participates in the cross-host counter
reduction, and reports what it did as one JSON line on stdout.
"""

import json
import os
import pathlib
import sys

if os.environ.get("BJXA_COV_DIR"):  # parent is tools/coverage_run.py
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import covlib

    covlib.start_from_env()

import jax

# Must beat any backend instantiation; the env var is too late here because
# the environment's sitecustomize imports jax at interpreter start.
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    cfg = json.loads(sys.argv[1])

    if cfg.get("devices"):
        # N-process x M-device composition: each process exposes M virtual
        # CPU devices (must be set before the CPU client is instantiated)
        # and drives its file shard through a LOCAL M-device mesh.
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cfg['devices']}"
        )

    from bjxa_tpu.parallel import distributed

    assert distributed.initialize(
        cfg["coordinator"], cfg["num_processes"], cfg["process_id"]
    )
    # idempotent: a second call notices the wired client and returns
    assert distributed.initialize(
        cfg["coordinator"], cfg["num_processes"], cfg["process_id"]
    )

    mesh = None
    mesh_shardings = []
    if cfg.get("devices"):
        from bjxa_tpu.parallel import sharded
        from bjxa_tpu.parallel.mesh import make_mesh

        local = jax.local_devices()
        assert len(local) == cfg["devices"], (local, cfg["devices"])
        mesh = make_mesh(local, dp=len(local), sp=1)

        # record how many devices each sharded batch actually spanned
        orig = sharded.decode_corpus_sharded_words

        def spy(*a, **k):
            pcm, reasm = orig(*a, **k)
            mesh_shardings.append(len(pcm.sharding.device_set))
            return pcm, reasm

        sharded.decode_corpus_sharded_words = spy

    if cfg.get("encode"):
        from bjxa_tpu.parallel.corpus import encode_corpus

        res = encode_corpus(
            cfg["src"], cfg["out"], bits=cfg.get("bits", 6), mesh=mesh
        )
        suffix = "*.xa"
        manifest = (
            pathlib.Path(cfg["out"])
            / f".bjxa-encode-manifest-{jax.process_index()}.jsonl"
        )
    else:
        from bjxa_tpu.parallel.corpus import decode_corpus

        res = decode_corpus(cfg["src"], cfg["out"], mesh=mesh)
        suffix = "*.wav"
        manifest = (
            pathlib.Path(cfg["out"])
            / f".bjxa-manifest-{jax.process_index()}.jsonl"
        )

    global_converted, global_failed = distributed.allreduce_sum(
        [res.converted, len(res.failed)]
    )
    counters = distributed.allreduce_counters(res.counters)

    # regression: counter reduction must survive values beyond int32
    # (JAX truncates int64 without x64; the wire format splits 31-bit halves)
    (big,) = distributed.allreduce_sum([2**40 + jax.process_index()])
    n = jax.process_count()
    assert big == n * 2**40 + n * (n - 1) // 2, big
    assert counters.elapsed() > 0

    mine = [
        json.loads(line)["key"]
        for line in manifest.read_text().splitlines()
        if line.strip()
    ]
    print(
        json.dumps(
            {
                "process_index": jax.process_index(),
                "process_count": jax.process_count(),
                "local_devices": len(jax.local_devices()),
                "global_devices": len(jax.devices()),
                "converted": res.converted,
                "failed": sorted(res.failed),
                "inputs_done": sorted(
                    pathlib.Path(k).name for k in mine
                ),
                "outputs": sorted(
                    p.name for p in pathlib.Path(cfg["out"]).glob(suffix)
                ),
                "global_converted": global_converted,
                "global_failed": global_failed,
                "global_samples": counters.samples,
                "global_files": counters.files,
                "mesh_shardings": mesh_shardings,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
