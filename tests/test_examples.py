"""Smoke tests for the research examples (examples/, SURVEY.md §2 row 25).

The reference ships these entirely untested; each example's main() runs here
with tiny iteration counts through its own argv surface, asserting it
completes and produces its artifact.
"""

import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")


@pytest.fixture(autouse=True)
def _examples_on_path(monkeypatch):
    monkeypatch.syspath_prepend(EXAMPLES)


def _run(monkeypatch, module, argv):
    import importlib

    mod = importlib.import_module(module)
    monkeypatch.setattr("sys.argv", [module + ".py"] + argv)
    mod.main()


def test_kurtosis_example(monkeypatch, tmp_path):
    out = tmp_path / "k.png"
    _run(monkeypatch, "kurtosis_example", ["-n", "500", "-d", "4", "-o", str(out)])
    assert out.stat().st_size > 0


def test_kurtosis_single_example(monkeypatch, tmp_path):
    out = tmp_path / "ks.png"
    _run(monkeypatch, "kurtosis_single_example",
         ["-l", "4", "-b", "8", "-n", "10", "-o", str(out)])
    assert out.stat().st_size > 0


def test_kurtosis_pso(monkeypatch, capsys, tmp_path):
    out = tmp_path / "pso.png"
    _run(monkeypatch, "kurtosis_pso",
         ["-p", "8", "-b", "16", "-d", "4", "-n", "10", "-o", str(out)])
    assert "kurtosis" in capsys.readouterr().out.lower()
    assert out.stat().st_size > 0


def test_gamma_example(monkeypatch, capsys):
    _run(monkeypatch, "gamma_example", ["-n", "500"])
    out = capsys.readouterr().out
    assert "95%" in out and "Get Value from Probability" in out


def test_arc_walk(monkeypatch, tmp_path):
    out = tmp_path / "a.png"
    _run(monkeypatch, "arc_walk", ["-n", "8", "-d", "3", "-o", str(out)])
    assert out.stat().st_size > 0


def test_quick_camera_streamer(monkeypatch, tmp_path):
    _run(monkeypatch, "quick_camera_streamer",
         ["synthetic", "-n", "3", "-o", str(tmp_path)])
    assert len(list(tmp_path.glob("*.png"))) == 3
