"""Install-story test (VERDICT r3 item 8): build the wheel, install it
into a clean venv, and run the ``bjxa-tpu`` console entry point from a
foreign working directory.

The reference analog is ``./configure && make && make check``
(``Makefile.am:124-139``): proof that what ships actually installs and
runs, not just that the source tree works.  The venv uses
``--system-site-packages`` so the already-present jax/numpy satisfy the
dependencies without network access; the wheel itself installs with
``--no-deps``.
"""

import os
import subprocess
import sys
import venv

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    dist = tmp_path_factory.mktemp("dist")
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "pip",
            "wheel",
            REPO,
            "--no-deps",
            "--no-build-isolation",
            "--wheel-dir",
            str(dist),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr
    wheels = list(dist.glob("bjxa_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    return wheels[0]


def test_wheel_installs_and_cli_runs(tmp_path, wheel):
    env_dir = tmp_path / "venv"
    venv.EnvBuilder(
        system_site_packages=True, with_pip=True
    ).create(env_dir)
    vpy = env_dir / "bin" / "python"

    # The test runner may itself live in a venv, in which case
    # system_site_packages points past its site dir; expose the runner's
    # dependency locations (jax, numpy) to the new venv via a .pth file.
    # The installed wheel still resolves from the NEW venv (its site dir
    # precedes .pth additions) and nothing supplies bjxa_tpu but the
    # wheel, so the package under test is the installed one.
    import jax
    import numpy

    dep_dirs = sorted(
        {
            os.path.dirname(os.path.dirname(mod.__file__))
            for mod in (jax, numpy)
        }
    )
    site_dirs = subprocess.run(
        [str(vpy), "-c",
         "import site; print(site.getsitepackages()[0])"],
        capture_output=True, text=True, timeout=60,
    ).stdout.strip()
    (
        env_dir / os.path.relpath(site_dirs, env_dir) / "host-deps.pth"
    ).write_text("\n".join(dep_dirs) + "\n")
    res = subprocess.run(
        [str(vpy), "-m", "pip", "install", "--no-deps", str(wheel)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr

    # a small fixture: known PCM -> XA via the in-tree library, decoded
    # back by the INSTALLED console script from a foreign cwd
    from bjxa_tpu.api import encode_pcm, xa_to_wav

    rng = np.random.default_rng(4)
    pcm = rng.integers(-20000, 20000, size=(130 * 32, 2)).astype(np.int16)
    xa = encode_pcm(pcm, 44100, 6, search=False)
    (tmp_path / "in.xa").write_bytes(xa)
    want = xa_to_wav(xa)

    env = dict(os.environ)
    env["BJXA_PLATFORM"] = "cpu"
    env.pop("PYTHONPATH", None)  # the venv's site-packages must suffice
    cli = env_dir / "bin" / "bjxa-tpu"
    assert cli.exists()
    res = subprocess.run(
        [str(cli), "decode", "in.xa", "out.wav"],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert res.returncode == 0, res.stderr
    assert (tmp_path / "out.wav").read_bytes() == want

    # the usage surface works too
    res = subprocess.run(
        [str(cli), "help"],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 0
    assert "Usage:" in res.stdout
