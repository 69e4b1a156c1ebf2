"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh regardless of what accelerator the
host exposes: sharding logic is validated without TPU hardware, and the
single real chip (when present) is left to the benchmark driver.

The axon sitecustomize pins JAX_PLATFORMS to the TPU plugin before pytest
starts, so plain env vars in this file would be too late for the plugin but
just in time for backend selection: jax.config.update() below overrides the
platform before any backend client is instantiated by the tests.
"""

import os
import pathlib

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

# BJXA_TEST_TPU=1 keeps the real accelerator (used by the TPU-backend
# coverage pass to exercise device-dispatch branches); default is the
# virtual CPU mesh.
if not os.environ.get("BJXA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# Persist XLA compilations across pytest runs: the suite is dominated by
# CPU-backend compiles of large static shapes, which never change between
# runs of the same code.  Safe because the cache key covers the HLO.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "BJXA_TEST_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "bjxa-tpu",
            "jax-test",
        ),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the full Pallas-interpret matrix)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long Pallas-interpret / big-shape case (run with --slow)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow; pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="module", autouse=True)
def _compiled_cache_hygiene():
    """Release compiled executables between test modules.

    Every distinct shape the suite compiles stays mmap'd (XLA:CPU JIT
    code pages + glibc arena retention); across the full ``--slow`` run
    the process crossed the kernel's default 65530 ``vm.max_map_count``
    and SIGSEGV'd inside XLA's executable deserializer (measured:
    64415 maps / 18.4 GB RSS just before the crash — PERFORMANCE.md
    "Slow tier").  Dropping caches at module boundaries keeps the map
    count bounded; the persistent compilation cache makes the later
    recompiles cheap disk reloads.
    """
    yield
    from bjxa_tpu.utils.hygiene import clear_compiled_caches

    clear_compiled_caches()

REFERENCE_DIR = pathlib.Path(
    os.environ.get("BJXA_REFERENCE_DIR", "/root/reference")
)
FIXTURE_DIR = REFERENCE_DIR / "test"


@pytest.fixture(scope="session")
def fixture_dir():
    if not FIXTURE_DIR.is_dir():
        pytest.skip("reference fixture corpus not available")
    return FIXTURE_DIR


@pytest.fixture(scope="session")
def ref_bjxa(tmp_path_factory):
    """The reference CLI binary, compiled once per session (``cc -O2`` +
    an empty ``config.h`` — SURVEY §4's differential-test recipe)."""
    ref_src = REFERENCE_DIR / "src"
    if not ref_src.is_dir():
        pytest.skip("reference sources not available")
    import subprocess

    build = tmp_path_factory.mktemp("refbuild")
    (build / "config.h").write_text("")
    exe = build / "bjxa-ref"
    sources = ["bjxa.c", "bjxa_decode.c", "bjxa_encode.c", "libbjxa.c"]
    subprocess.run(
        ["cc", "-O2", f"-I{build}", f"-I{ref_src}", "-o", str(exe)]
        + [str(ref_src / s) for s in sources],
        check=True,
        capture_output=True,
    )
    return exe
