"""Reusable sys.monitoring line collector (see coverage_run.py).

Kept dependency-free and tiny so subprocess workers (the multi-process
distributed tests) can enable it via the ``BJXA_COV_DIR`` env var and
dump their hits for the parent run to merge.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "bjxa_tpu") + os.sep

TOOL = sys.monitoring.COVERAGE_ID
covered: dict[str, set[int]] = {}


def _line_cb(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        covered.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def start() -> None:
    sys.monitoring.use_tool_id(TOOL, "bjxa-cov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _line_cb
    )
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)


def stop() -> None:
    sys.monitoring.set_events(TOOL, 0)


def dump(path: str) -> None:
    with open(path, "w") as f:
        json.dump({k: sorted(v) for k, v in covered.items()}, f)


def start_from_env() -> None:
    """Enable collection + atexit dump when ``BJXA_COV_DIR`` is set —
    called by subprocess entry points (tests/_mp_worker.py)."""
    cov_dir = os.environ.get("BJXA_COV_DIR")
    if not cov_dir:
        return
    import atexit

    start()
    atexit.register(
        lambda: dump(os.path.join(cov_dir, f"hits-{os.getpid()}.json"))
    )
