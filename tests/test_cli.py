"""CLI tests — the ``test_bjxa.sh`` port plus CLI-level decode error paths
(``test_decode_error.sh``), run in-process for speed with the same
stdin/stdout/- conventions the reference checks.
"""

import hashlib
import io
import sys

import pytest

from bjxa_tpu import cli
from bjxa_tpu.format.hexdsl import hex_to_bytes

STEREO8_WAV_SHA1 = "4b10d39db9abfb75bb3561d7a789ca5afb046c75"


def run_cli(args, stdin: bytes = b"", monkeypatch=None):
    """Invoke cli.main with captured binary stdio; returns (code, out, err)."""
    out_buf = io.BytesIO()
    err = io.StringIO()

    class In:
        buffer = io.BytesIO(stdin)

    class Out:
        buffer = out_buf

        @staticmethod
        def write(s):
            pass

    old = sys.stdin, sys.stdout, sys.stderr
    sys.stdin, sys.stderr = In(), err
    real_stdout = sys.stdout
    sys.stdout = Out()
    # `help` writes text to sys.stdout directly
    sys.stdout.write = lambda s: out_buf.write(s.encode())
    try:
        code = cli.main(["bjxa"] + args)
    finally:
        sys.stdin, sys.stdout, sys.stderr = old
    return code, out_buf.getvalue(), err.getvalue()


def sha1(b):
    return hashlib.sha1(b).hexdigest()


# -- actions ----------------------------------------------------------------


def test_help():
    code, out, err = run_cli(["help"])
    assert code == 0
    assert b"Usage:" in out


def test_no_action():
    code, out, err = run_cli([])
    assert code == 1
    assert "Missing an action" in err


def test_unknown_action():
    code, out, err = run_cli(["unknown"])
    assert code == 1
    assert "Unknown action" in err


# -- decode argument conventions -------------------------------------------


@pytest.fixture(scope="module")
def stereo8(fixture_dir_module):
    return (fixture_dir_module / "square-stereo-8.xa").read_bytes()


@pytest.fixture(scope="module")
def fixture_dir_module():
    import pathlib, os

    d = pathlib.Path(
        os.environ.get("BJXA_REFERENCE_DIR", "/root/reference")
    ) / "test"
    if not d.is_dir():
        pytest.skip("reference fixture corpus not available")
    return d


def test_decode_stdin_stdout(stereo8):
    code, out, err = run_cli(["decode"], stdin=stereo8)
    assert code == 0
    assert sha1(out) == STEREO8_WAV_SHA1


def test_decode_file_arg(stereo8, fixture_dir_module):
    code, out, err = run_cli(
        ["decode", str(fixture_dir_module / "square-stereo-8.xa")]
    )
    assert code == 0
    assert sha1(out) == STEREO8_WAV_SHA1


def test_decode_dash_args(stereo8, fixture_dir_module):
    code, out, err = run_cli(
        ["decode", str(fixture_dir_module / "square-stereo-8.xa"), "-"]
    )
    assert code == 0 and sha1(out) == STEREO8_WAV_SHA1
    code, out, err = run_cli(["decode", "-", "-"], stdin=stereo8)
    assert code == 0 and sha1(out) == STEREO8_WAV_SHA1


def test_decode_to_file(stereo8, tmp_path):
    dst = tmp_path / "out.wav"
    code, out, err = run_cli(["decode", "-", str(dst)], stdin=stereo8)
    assert code == 0
    assert sha1(dst.read_bytes()) == STEREO8_WAV_SHA1


def test_decode_streaming_mode(stereo8):
    code, out, err = run_cli(["decode", "--streaming"], stdin=stereo8)
    assert code == 0
    assert sha1(out) == STEREO8_WAV_SHA1


def test_decode_too_many_args():
    code, out, err = run_cli(["decode", "a", "b", "c"])
    assert code == 1
    assert "Too many arguments" in err


def test_decode_nonexistent_input(tmp_path):
    code, out, err = run_cli(["decode", str(tmp_path / "nope.xa")])
    assert code == 1
    assert "Error" in err


def test_decode_unwritable_output(stereo8, tmp_path):
    code, out, err = run_cli(
        ["decode", "-", str(tmp_path / "no/dir/out.wav")], stdin=stereo8
    )
    assert code == 1
    assert "Error" in err


# -- encode argument conventions -------------------------------------------


def test_encode_too_many_args():
    for args in (
        ["encode", "a", "b", "c"],
        ["encode", "--bits", "4", "a", "b", "c"],
    ):
        code, out, err = run_cli(args)
        assert code == 1
        assert "Too many arguments" in err


def test_encode_missing_bits():
    code, out, err = run_cli(["encode", "--bits"])
    assert code == 1
    assert "Missing number of bits per sample" in err


@pytest.mark.parametrize("val", ["5", "8001", "x"])
def test_encode_invalid_bits(val):
    code, out, err = run_cli(["encode", "--bits", val])
    assert code == 1
    assert "Invalid number of bits per sample" in err


def test_encode_nonexistent_input(tmp_path):
    code, out, err = run_cli(["encode", str(tmp_path / "nope.wav")])
    assert code == 1
    assert "Error" in err


def test_encode_decode_roundtrip(fixture_dir_module):
    wav = (fixture_dir_module / "square-mono.wav").read_bytes()
    code, xa, err = run_cli(["encode", "--bits", "8"], stdin=wav)
    assert code == 0 and xa[:4] == b"KWD1"
    code, out, err = run_cli(["decode"], stdin=xa)
    assert code == 0
    # canonical header + same payload length
    assert out[:4] == b"RIFF" and len(out) == len(wav)


# -- decode error paths (CLI level) ----------------------------------------


def test_decode_empty_input():
    code, out, err = run_cli(["decode"], stdin=b"")
    assert code == 1
    assert "bjxa_fread_header" in err


def test_decode_bad_magic():
    code, out, err = run_cli(["decode"], stdin=b"KWD2" + bytes(28))
    assert code == 1
    assert "bjxa_fread_header" in err


def test_decode_truncated_payload():
    hdr = hex_to_bytes(
        """
        4b574431 | KWD1
        21000000 | 33
        20000000 | 32
        44ac 08 01 | 44100 8bit mono
        00000000 | loop
        0000 0000 0000 0000 | bef
        00000000 | pad
        """
    )
    code, out, err = run_cli(["decode"], stdin=hdr + bytes(10))
    assert code == 1
    assert "End of file" in err
    assert out[:4] == b"RIFF"  # header written before the failure


INVALID_PROFILE_XA = """
4b574431 | KWD1
32000000 | 50
20000000 | 32
44ac 06 02 | 44100 6bit stereo
00000000 | loop
0000 0000 0000 0000 | bef
00000000 | pad
00       | ok profile
00000000 00000000 00000000
00000000 00000000 00000000
ff       | invalid profile
00000000 00000000 00000000
00000000 00000000 00000000
"""


@pytest.mark.parametrize("mode", [[], ["--streaming"]])
def test_decode_invalid_profile(mode):
    code, out, err = run_cli(
        ["decode"] + mode, stdin=hex_to_bytes(INVALID_PROFILE_XA)
    )
    assert code == 1
    assert "bjxa_decode" in err
    assert out[:4] == b"RIFF"


# -- corpus action ------------------------------------------------------------


def test_corpus_action(tmp_path, fixture_dir):
    src = tmp_path / "xa"
    out = tmp_path / "wav"
    src.mkdir()
    for name in ("square-stereo-8", "square-mono-6"):
        (src / f"{name}.xa").write_bytes(
            (fixture_dir / f"{name}.xa").read_bytes()
        )
    code, stdout, err = run_cli(["corpus", str(src), str(out)])
    assert code == 0, err
    assert b"converted 2" in stdout
    wav = (out / "square-stereo-8.wav").read_bytes()
    assert sha1(wav) == STEREO8_WAV_SHA1
    # rerun skips through the manifest
    code, stdout, _ = run_cli(["corpus", str(src), str(out)])
    assert code == 0
    assert b"skipped 2" in stdout


def test_corpus_action_trace_and_stats(tmp_path):
    """--trace captures a jax.profiler trace directory; --stats prints
    throughput rates."""
    src = tmp_path / "xa"
    out = tmp_path / "wav"
    trace = tmp_path / "trace"
    src.mkdir()
    # a tiny synthetic file: the assertions are about trace/stats
    # plumbing, not bit-exactness, and a fixture-sized corpus costs a
    # fresh multi-second compile of the full-length shape
    import numpy as np

    from bjxa_tpu.api import encode_pcm

    sig = (np.arange(8 * 32, dtype=np.int16) * 64).reshape(-1, 1)
    (src / "a.xa").write_bytes(encode_pcm(sig, 44100, 4, search=False))
    code, stdout, err = run_cli(
        ["corpus", "--trace", str(trace), "--stats", str(src), str(out)]
    )
    assert code == 0, err
    assert b"files_per_s" in stdout and b"msamples_per_s" in stdout
    produced = [p for p in trace.rglob("*") if p.is_file()]
    assert produced, "no trace files captured"


def test_corpus_action_bad_args(tmp_path):
    code, _, err = run_cli(["corpus", str(tmp_path)])
    assert code == 1
    code, _, err = run_cli(["corpus", "--batch-files", "x", "a", "b"])
    assert code == 1
    code, _, err = run_cli(["corpus", str(tmp_path / "nope"), str(tmp_path)])
    assert code == 1
    assert "Not a directory" in err


def test_corpus_action_reports_failures(tmp_path, fixture_dir):
    src = tmp_path / "xa"
    out = tmp_path / "wav"
    src.mkdir()
    (src / "good.xa").write_bytes(
        (fixture_dir / "square-mono-4.xa").read_bytes()
    )
    (src / "bad.xa").write_bytes(b"JUNK" + bytes(60))
    code, stdout, err = run_cli(["corpus", str(src), str(out)])
    assert code == 1
    assert "bad.xa" in err
    assert b"converted 1" in stdout
    assert (out / "good.wav").exists()


def test_corpus_encode_action(tmp_path, fixture_dir):
    src = tmp_path / "wav"
    out = tmp_path / "xa"
    src.mkdir()
    # decode a fixture to get a real WAV, then corpus-encode it back
    code, wav, _ = run_cli(
        ["decode"], stdin=(fixture_dir / "square-mono-6.xa").read_bytes()
    )
    assert code == 0
    (src / "sq.wav").write_bytes(wav)
    code, stdout, err = run_cli(
        ["corpus", "--encode", "--bits", "6", str(src), str(out)]
    )
    assert code == 0, err
    assert b"converted 1" in stdout
    assert (out / "sq.xa").read_bytes()[:4] == b"KWD1"
    code, _, _ = run_cli(
        ["corpus", "--encode", "--bits", "5", str(src), str(out)]
    )
    assert code == 1


def test_corpus_decode_rejects_encode_flags(tmp_path):
    code, _, err = run_cli(["corpus", "--bits", "4", str(tmp_path), str(tmp_path)])
    assert code == 1 and "require --encode" in err
    code, _, err = run_cli(["corpus", "--truncate", str(tmp_path), str(tmp_path)])
    assert code == 1 and "require --encode" in err


# -- driver error paths -------------------------------------------------------


def test_decode_streaming_truncated(fixture_dir):
    data = (fixture_dir / "square-mono-4.xa").read_bytes()
    code, _, err = run_cli(["decode", "--streaming"], stdin=data[:200])
    assert code == 1
    assert "End of file" in err


def test_encode_driver_errors(tmp_path):
    # short RIFF header
    code, _, err = run_cli(["encode"], stdin=b"RIFF")
    assert code == 1 and "bjxa_fread_riff_header" in err
    # malformed RIFF header
    code, _, err = run_cli(["encode"], stdin=b"JUNK" + bytes(40))
    assert code == 1 and "bjxa_fread_riff_header" in err
    # truncated PCM body
    from bjxa_tpu.format import dump_riff_header

    hdr = dump_riff_header(1024, 44100, 1)
    code, _, err = run_cli(["encode"], stdin=hdr + bytes(10))
    assert code == 1 and "End of file" in err
    # invalid --bits
    code, _, err = run_cli(["encode", "--bits", "5", "a", "b"])
    assert code == 1 and "Invalid number of bits" in err
    # too many positional args
    code, _, err = run_cli(["encode", "a", "b", "c"])
    assert code == 1 and "Too many arguments" in err
    # unreadable input path
    code, _, err = run_cli(["encode", str(tmp_path / "missing.wav")])
    assert code == 1


def test_corpus_option_errors(tmp_path):
    ok = [str(tmp_path), str(tmp_path)]
    for bad in (
        ["corpus", "--coordinator"] + ok,
        ["corpus", "--num-processes", "0"] + ok,
        ["corpus", "--num-processes", "x"] + ok,
        ["corpus", "--process-id", "-1"] + ok,
        ["corpus", "--manifest"] + ok,
        ["corpus", "--trace"] + ok,
        ["corpus", "--batch-files", "0"] + ok,
        ["corpus", "--bits", "6"] + ok,  # requires --encode
        ["corpus", "--truncate"] + ok,  # requires --encode
        ["corpus", "--what"] + ok,
    ):
        code, _, err = run_cli(bad)
        assert code == 1, bad
        assert err, bad


def test_corpus_encode_truncate_action(tmp_path):
    import numpy as np

    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.format import dump_pcm, dump_riff_header

    src = tmp_path / "wav"
    out = tmp_path / "xa"
    src.mkdir()
    pcm = (np.arange(100, dtype=np.int16) * 99)[:, None]
    (src / "t.wav").write_bytes(
        dump_riff_header(pcm.size * 2, 44100, 1) + dump_pcm(pcm)
    )
    code, stdout, err = run_cli(
        ["corpus", "--encode", "--bits", "8", "--truncate", str(src), str(out)]
    )
    assert code == 0, err
    assert (out / "t.xa").read_bytes() == encode_pcm(
        pcm, 44100, 8, search=False
    )


# -- multi-device CLI (VERDICT r3 item 1) -----------------------------------


def test_decode_huge_promised_data_len_truncated():
    """A tiny file whose header promises a huge u32 data_len decodes only
    the blocks that arrived — O(available) work and memory, like the
    reference's O(block) streaming loop — instead of materializing the
    promised stream (ADVICE r3)."""
    import numpy as np

    from bjxa_tpu.format import dump_pcm, dump_riff_header
    from bjxa_tpu.format.xa import XAFormat, dump_xa_header

    nblocks = 4_000_000  # promises ~200 MB payload / ~1 GB PCM
    fmt = XAFormat(
        data_len=nblocks * 50,
        samples=nblocks * 32,
        samples_rate=44100,
        bits=6,
        channels=2,
        initial_state=((0, 0), (0, 0)),
    )
    data = dump_xa_header(fmt) + bytes(3 * 50)  # 3 effective blocks
    code, out, err = run_cli(["decode"], stdin=data)
    assert code == 1
    assert "End of file" in err
    want = dump_riff_header(fmt.data_len_pcm, 44100, 2) + dump_pcm(
        np.zeros((3 * 32, 2), np.int16)
    )
    assert out == want


def test_cli_corpus_auto_mesh(tmp_path, monkeypatch):
    """``bjxa corpus`` auto-builds a dp mesh over the local devices: batch
    PCM is sharded across all 8 virtual devices (asserted via sharding
    introspection) and output is byte-identical to the per-file path."""
    import jax
    import numpy as np

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bjxa_tpu.api import encode_pcm, xa_to_wav
    from bjxa_tpu.parallel import sharded

    rng = np.random.default_rng(3)
    src = tmp_path / "src"
    src.mkdir()
    expect = {}
    for i, (bits, ch, samples) in enumerate([(6, 2, 300), (4, 1, 100)]):
        sig = rng.integers(-20000, 20000, size=(samples, ch)).astype(
            np.int16
        )
        xa = encode_pcm(sig, 44100, bits, search=False)
        (src / f"f{i}.xa").write_bytes(xa)
        expect[f"f{i}"] = xa_to_wav(xa)

    shardings = []
    orig = sharded.decode_corpus_sharded_words

    def spy(*a, **k):
        pcm_flat, reasm = orig(*a, **k)
        shardings.append(pcm_flat.sharding)
        return pcm_flat, reasm

    monkeypatch.setattr(sharded, "decode_corpus_sharded_words", spy)
    out = tmp_path / "out"
    code, _, err = run_cli(["corpus", str(src), str(out)])
    assert code == 0, err
    assert shardings, "corpus did not route through the sharded path"
    for sh in shardings:
        assert len(sh.device_set) == 8, sh
    for stem, wav in expect.items():
        assert (out / f"{stem}.wav").read_bytes() == wav


def test_cli_corpus_devices_one_forces_single(tmp_path, monkeypatch):
    """--devices 1 keeps the single-device packed path (no shard_map)."""
    import numpy as np

    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel import sharded

    src = tmp_path / "src"
    src.mkdir()
    sig = np.zeros((100, 1), np.int16)
    (src / "f.xa").write_bytes(encode_pcm(sig, 44100, 6, search=False))

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("sharded path used with --devices 1")

    monkeypatch.setattr(sharded, "decode_corpus_sharded_words", boom)
    out = tmp_path / "out"
    code, _, err = run_cli(
        ["corpus", "--devices", "1", str(src), str(out)]
    )
    assert code == 0, err


def test_cli_decode_long_stream_auto_sp(tmp_path, monkeypatch):
    """CLI decode of a long stream auto-shards its block range across the
    local devices (the ppermute ring) and is byte-identical to the forced
    single-device run."""
    import jax
    import numpy as np

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bjxa_tpu.api import encode_pcm
    from bjxa_tpu.parallel import sharded

    rng = np.random.default_rng(9)
    sig = rng.integers(-25000, 25000, size=(2100 * 32, 1)).astype(np.int16)
    xa = encode_pcm(sig, 44100, 6, search=False)

    calls = []
    orig = sharded.decode_file_sharded

    def spy(*a, **k):
        calls.append(k.get("mesh"))
        return orig(*a, **k)

    monkeypatch.setattr(sharded, "decode_file_sharded", spy)
    code, out_mesh, err = run_cli(["decode"], stdin=xa)
    assert code == 0, err
    assert len(calls) == 1, "long stream did not use the sp ring"
    code, out_single, err = run_cli(["decode", "--devices", "1"], stdin=xa)
    assert code == 0, err
    assert len(calls) == 1  # forced single-device run stayed off the ring
    assert out_mesh == out_single


def test_cli_devices_validation():
    code, _, err = run_cli(["decode", "--devices", "0"])
    assert code == 1 and "Invalid --devices" in err
    code, _, err = run_cli(["corpus", "--devices", "x", "a", "b"])
    assert code == 1 and "Invalid --devices" in err
    code, _, err = run_cli(["corpus", "--devices", "4096", ".", "."])
    assert code == 1 and "out of range" in err


def test_cli_devices_env_validation(monkeypatch):
    monkeypatch.setenv("BJXA_DEVICES", "banana")
    code, _, err = run_cli(["decode"], stdin=b"")
    assert code == 1 and "Invalid BJXA_DEVICES" in err
    code, _, err = run_cli(["corpus", ".", "."])
    assert code == 1 and "Invalid BJXA_DEVICES" in err
    monkeypatch.setenv("BJXA_DEVICES", "4096")
    code, _, err = run_cli(["decode"], stdin=b"")
    assert code == 1 and "out of range" in err


def test_cli_segment_blocks_validation():
    code, _, err = run_cli(["decode", "--segment-blocks", "0"])
    assert code == 1 and "Invalid --segment-blocks" in err
    code, _, err = run_cli(["encode", "--segment-blocks", "x"])
    assert code == 1 and "Invalid --segment-blocks" in err


def test_cli_decode_unknown_flag_is_filename():
    """A non-option-looking-but-unknown '--flag' falls out of the option
    loop and is treated as a (missing) input file, like the reference's
    positional handling."""
    code, _, err = run_cli(["decode", "--bogus"])
    assert code == 1 and "Error" in err


def test_encode_devices_invalid_value():
    """Bad --devices values on encode fail with usage, like decode's."""
    for bad in ("0", "abc"):
        code, _, err = run_cli(["encode", "--devices", bad, "-", "-"])
        assert code == 1
        assert "Invalid --devices" in err


def test_encode_devices_out_of_range():
    """An explicit encode --devices beyond the local device count fails
    eagerly with the range message (mirror of the decode path)."""
    import numpy as np

    from bjxa_tpu.format import dump_riff_header

    pcm = np.zeros((64, 1), np.int16)
    wav = dump_riff_header(pcm.nbytes, 44100, 1) + pcm.tobytes()
    code, _, err = run_cli(["encode", "--devices", "99", "-", "-"], stdin=wav)
    assert code == 1
    assert "out of range" in err


def test_decode_truncated_payload_with_invalid_profile():
    """A truncated stream whose available prefix also contains an invalid
    profile factor reports the protocol error (the truncated-decode
    branch's validity check), after emitting the frames before it."""
    import numpy as np

    from bjxa_tpu.format.xa import XAFormat, dump_xa_header

    fmt = XAFormat(
        data_len=8 * 25,
        samples=8 * 32,
        samples_rate=44100,
        bits=6,
        channels=1,
        initial_state=((0, 0), (0, 0)),
    )
    blocks = np.zeros((4, 25), np.uint8)  # only 4 of 8 blocks arrive
    blocks[2, 0] = 0xFF  # invalid factor in the available prefix
    data = dump_xa_header(fmt) + blocks.tobytes()
    code, out, err = run_cli(["decode"], stdin=data)
    assert code == 1
    assert "bjxa_decode" in err
    # frames of the 2 valid blocks preceding the bad one were emitted
    assert len(out) == 44 + 2 * 32 * 2


# ---------------------------------------------------------------------------
# abi action (drop-in C library install)
# ---------------------------------------------------------------------------


def test_abi_usage_errors():
    code, _, err = run_cli(["abi"])
    assert code == 1 and "abi requires --install" in err
    code, _, err = run_cli(["abi", "--frobnicate", "x"])
    assert code == 1 and "abi requires --install" in err


def test_abi_install(tmp_path):
    from bjxa_tpu.native import abi

    if not abi.available():
        pytest.skip("no native toolchain")
    prefix = tmp_path / "prefix"
    code, out, err = run_cli(["abi", "--install", str(prefix)])
    assert code == 0 and err == ""
    lines = dict(
        line.split(" ", 1) for line in out.decode().strip().splitlines()
    )
    assert (prefix / "lib" / "libbjxa.so.0").exists()
    assert lines["header"] == str(prefix / "include" / "bjxa.h")
    assert lines["pkgconfig"] == str(
        prefix / "lib" / "pkgconfig" / "bjxa.pc"
    )


def test_abi_install_no_toolchain(monkeypatch):
    from bjxa_tpu.native import abi

    monkeypatch.setenv("BJXA_NO_NATIVE", "1")
    lib, tried = abi._lib, abi._tried
    abi._lib, abi._tried = None, False
    try:
        code, _, err = run_cli(["abi", "--install", "/nonexistent/prefix"])
    finally:
        abi._lib, abi._tried = lib, tried
    assert code == 1 and "unavailable" in err


def test_abi_install_unwritable(tmp_path):
    from bjxa_tpu.native import abi

    if not abi.available():
        pytest.skip("no native toolchain")
    blocker = tmp_path / "file"
    blocker.write_bytes(b"")
    code, _, err = run_cli(["abi", "--install", str(blocker / "prefix")])
    assert code == 1 and "abi:" in err
