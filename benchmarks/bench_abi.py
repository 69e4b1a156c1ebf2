"""Host C engine vs reference C binary: single-core decode throughput.

Measures the drop-in C ABI (whole-file decode through ctypes, including
the LE PCM serialization) against the compiled reference CLI decoding
the same fixture end to end.  Both run one core on the same host; the
reference's measured SURVEY baseline is ~77 files/s (~100 Msamples/s)
on `square-stereo-8.xa`.

Run manually: python benchmarks/bench_abi.py
"""
import ctypes
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = pathlib.Path(
    os.environ.get("BJXA_REFERENCE_DIR", "/root/reference")
) / "test" / "square-stereo-8.xa"
REF_SRC = pathlib.Path(
    os.environ.get("BJXA_REFERENCE_DIR", "/root/reference")
) / "src"
REPS = int(os.environ.get("BENCH_REPS", "30"))


def build_reference(tmp: pathlib.Path) -> pathlib.Path | None:
    if not REF_SRC.is_dir():
        return None
    (tmp / "config.h").write_text("")
    exe = tmp / "bjxa-ref"
    srcs = ["bjxa.c", "bjxa_decode.c", "bjxa_encode.c", "libbjxa.c"]
    subprocess.run(
        ["cc", "-O2", f"-I{tmp}", f"-I{REF_SRC}", "-o", str(exe)]
        + [str(REF_SRC / s) for s in srcs],
        check=True,
        capture_output=True,
    )
    return exe


def bench_reference(exe: pathlib.Path, xa: bytes) -> float:
    """Median seconds per whole-file decode via the reference CLI."""
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        subprocess.run(
            [str(exe), "decode"], input=xa, capture_output=True, check=True
        )
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_abi(xa: bytes) -> tuple[float, int]:
    """Median seconds per whole-file decode via the drop-in C ABI."""
    from bjxa_tpu.native import abi

    L = abi.lib()
    assert L is not None, "no C++ toolchain"
    dec = ctypes.c_void_p(L.bjxa_decoder())
    assert L.bjxa_parse_header(dec, xa, len(xa)) == 32
    fmt = abi.CFormat()
    assert L.bjxa_decode_format(dec, ctypes.byref(fmt)) == 0
    payload = xa[32:]
    dst = ctypes.create_string_buffer(fmt.data_len_pcm)
    out = ctypes.create_string_buffer(44 + fmt.data_len_pcm)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        assert L.bjxa_parse_header(dec, xa, len(xa)) == 32  # reset progress
        assert L.bjxa_dump_riff_header(dec, out, 44) == 44
        n = L.bjxa_decode(dec, dst, len(dst), payload, len(payload))
        assert n == fmt.blocks
        assert (
            L.bjxa_dump_pcm(
                ctypes.byref(out, 44),
                ctypes.cast(dst, ctypes.c_void_p),
                fmt.data_len_pcm,
            )
            == 0
        )
        times.append(time.perf_counter() - t0)
    samples = fmt.data_len_pcm // 2  # total int16 samples incl. channels
    L.bjxa_free_decoder(ctypes.byref(dec))
    return sorted(times)[len(times) // 2], samples


def main():
    xa = FIXTURE.read_bytes()
    abi_s, samples = bench_abi(xa)
    result = {
        "fixture": FIXTURE.name,
        "reps": REPS,
        "abi_s_per_file": round(abi_s, 6),
        "abi_msamples_per_s": round(samples / abi_s / 1e6, 1),
    }
    with tempfile.TemporaryDirectory() as td:
        exe = build_reference(pathlib.Path(td))
        if exe is not None:
            ref_s = bench_reference(exe, xa)
            result["ref_s_per_file"] = round(ref_s, 6)
            result["ref_msamples_per_s"] = round(samples / ref_s / 1e6, 1)
            # The CLI includes process spawn + stdio; also time our ABI
            # plus an equivalent spawn overhead for a fair end-to-end view.
            spawn = []
            for _ in range(10):
                t0 = time.perf_counter()
                subprocess.run(
                    [str(exe), "help"], capture_output=True, check=False
                )
                spawn.append(time.perf_counter() - t0)
            result["ref_spawn_s"] = round(sorted(spawn)[len(spawn) // 2], 6)
            result["speedup_vs_ref"] = round(ref_s / abi_s, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
