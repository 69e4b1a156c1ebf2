"""``python -m bjxa_tpu`` dispatches into the CLI."""

import runpy
import sys

import pytest


def test_main_module_help(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["bjxa_tpu", "help"])
    with pytest.raises(SystemExit) as exc:
        runpy.run_module("bjxa_tpu", run_name="__main__")
    assert exc.value.code == 0
    assert "Usage:" in capsys.readouterr().out
