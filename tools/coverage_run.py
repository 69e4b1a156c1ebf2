"""Line-coverage runner for the bjxa_tpu package (no external deps).

The reference makes measured coverage a first-class goal (100% of the C
library, ``README.rst:166``, via ``lcov.am``).  This environment has no
coverage.py/pytest-cov, so this tool implements the same measurement on
CPython 3.12's ``sys.monitoring`` (PEP 669): LINE events are recorded
once per (code object, line) and then disabled, so steady-state overhead
is near zero; executable-line universes come from walking each module's
code objects (``co_lines``), the same definition lcov uses.

Usage:
    python tools/coverage_run.py [pytest args...]
    # e.g. python tools/coverage_run.py -q --slow tests/

Prints a per-file table plus a total, and writes ``coverage.json``.
Lines marked ``# pragma: no cover`` (or inside a block whose header is
marked) are excluded, mirroring lcov's LCOV_EXCL.  Subprocess workers
(the multi-process distributed tests) are not traced — their behavior is
asserted from the parent; treat the number as a lower bound.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "bjxa_tpu") + os.sep

TOOL = sys.monitoring.COVERAGE_ID
_covered: dict[str, set[int]] = {}


def _line_cb(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        _covered.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def _executable_lines(path: str) -> set[int]:
    """All statement lines of a module, from its compiled code objects."""
    with open(path, "r") as f:
        src = f.read()
    lines: set[int] = set()
    stack = [compile(src, path, "exec")]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            # line 0 is the module-prologue RESUME, never a real statement
            if ln:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # drop doc/pragma-excluded lines
    src_lines = src.splitlines()
    excl = {
        i + 1
        for i, text in enumerate(src_lines)
        if "pragma: no cover" in text
    }
    # a pragma on a block header (def/if/class...) excludes the block
    import ast

    tree = ast.parse(src)
    for node in ast.walk(tree):
        if hasattr(node, "lineno") and node.lineno in excl:
            end = getattr(node, "end_lineno", node.lineno)
            lines -= set(range(node.lineno, end + 1))
    return lines - excl


def main() -> int:
    # run as a script, sys.path[0] is tools/ — the tests need the repo root
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    sys.monitoring.use_tool_id(TOOL, "bjxa-cov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _line_cb
    )
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    args = sys.argv[1:] or ["-q", "tests/"]
    rc = pytest.main(args)

    sys.monitoring.set_events(TOOL, 0)

    rows = []
    tot_cov = tot_all = 0
    for root, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            exe = _executable_lines(path)
            hit = _covered.get(path, set()) & exe
            rows.append(
                (
                    os.path.relpath(path, REPO),
                    len(hit),
                    len(exe),
                    sorted(exe - hit),
                )
            )
            tot_cov += len(hit)
            tot_all += len(exe)

    rows.sort(key=lambda r: (r[1] / r[2] if r[2] else 1.0))
    print()
    print(f"{'file':<44} {'lines':>7} {'hit':>6} {'cov%':>6}  missing")
    for path, hit, total, missing in rows:
        pct = 100.0 * hit / total if total else 100.0
        miss = ",".join(map(str, missing[:12])) + (
            ",..." if len(missing) > 12 else ""
        )
        print(f"{path:<44} {total:>7} {hit:>6} {pct:>5.1f}%  {miss}")
    total_pct = 100.0 * tot_cov / tot_all if tot_all else 100.0
    print(f"\nTOTAL {tot_cov}/{tot_all} = {total_pct:.1f}% line coverage")

    with open(os.path.join(REPO, "coverage.json"), "w") as f:
        json.dump(
            {
                "total_pct": round(total_pct, 2),
                "covered": tot_cov,
                "executable": tot_all,
                "files": {
                    p: {"hit": h, "lines": t, "missing": m}
                    for p, h, t, m in rows
                },
            },
            f,
            indent=1,
        )
    print("wrote coverage.json")
    return int(rc)


if __name__ == "__main__":
    raise SystemExit(main())
