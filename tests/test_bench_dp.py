"""bench.py --dp N: the driver-runnable multi-chip bench path.

Validated here on the 8-device virtual CPU mesh (tiny preset) so the
aggregate multi-chip headline is ONE command (`python bench.py --dp N`) the
moment real chips appear: the sharded train+score step compiles, runs, and
the compiled (post-SPMD) HLO contains the gradient all-reduce collectives
GSPMD inserted for the data axis."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_dp_runs_sharded_and_emits_collectives(tmp_path):
    hlo = tmp_path / "step.hlo"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(
        TCVAE_PLATFORM="cpu", TCVAE_CPU_DEVICES="8",
        BENCH_PRESET="tiny", BENCH_BATCHES="16",
        TCVAE_COMPILER_OPTIONS="",  # TPU option names reject on CPU anyway
        PYTHONPATH=REPO,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--dp", "8", "--dump-hlo", str(hlo)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["devices"] == 8
    assert out["value"] > 0 and out["unit"] == "frames/sec"
    assert out["per_device"] == round(out["value"] / 8, 1)
    assert "AGGREGATE over 8" in out["metric"]
    # collectives evidence: the gradient all-reduce GSPMD inserted over the
    # data axis is in the compiled executable the bench actually timed
    text = hlo.read_text()
    assert "all-reduce" in text, text[:2000]


def test_bench_single_chip_contract_unchanged(tmp_path):
    """The driver runs plain `python bench.py` — the default (no --dp) JSON
    contract must stay exactly {metric, value, unit, vs_baseline}."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(
        TCVAE_PLATFORM="cpu", TCVAE_CPU_DEVICES="1",
        BENCH_PRESET="tiny", BENCH_BATCHES="16",
        TCVAE_COMPILER_OPTIONS="",
        PYTHONPATH=REPO,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["value"] > 0
