#!/usr/bin/env python3
"""r9: profile-guided XLA flag sweep on the flagship train+score step.

Round 1's "paths to close the gap" named "profile-guided XLA flag tuning"
(BENCH_NOTES r1 #2) and it was never measured. This sweeps the plausible
single-chip knobs on the exact bench.py step (b768, adam_lean + fast-vjp):

- ``--xla_tpu_scoped_vmem_limit_kib``: raises the VMEM budget the fusion
  pass may assume, allowing larger fusion tiles — relevant because the step
  is dominated by HBM-bound fusions (Adam update chains, narrow-conv grads)
  whose tile sizes bound their achieved bandwidth.
- ``--xla_tpu_enable_latency_hiding_scheduler``: overlap-oriented scheduling
  (mostly collectives, but also async copies on one chip).
- ``--xla_latency_hiding_scheduler_rerun``: scheduler effort.

Each config runs ``bench.py`` in a fresh subprocess (XLA flags must be set
before backend init; the tunnel is single-client so runs are serialized).
Results append to benchmarks/r9_results.jsonl. Unknown/rejected flags are
recorded as failures, not fatal.

Usage: python benchmarks/r9_xla_flags.py [--steps N]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "r9_results.jsonl")

CONFIGS = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    (
        "lhs+vmem64m",
        "--xla_tpu_enable_latency_hiding_scheduler=true "
        "--xla_tpu_scoped_vmem_limit_kib=65536",
    ),
]


def run_config(name: str, flags: str, timeout: int = 1500) -> dict:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    env["BENCH_BATCHES"] = "768"
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"config": name, "flags": flags, "error": f"timeout {timeout}s"}
    wall = time.time() - t0
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-3:]
        return {"config": name, "flags": flags, "error": " | ".join(tail),
                "wall_s": round(wall, 1)}
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    return {"config": name, "flags": flags, "frames_per_s": rec["value"],
            "wall_s": round(wall, 1)}


def main():
    results = []
    for name, flags in CONFIGS:
        rec = run_config(name, flags)
        rec["experiment"] = "r9_xla_flags"
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        results.append(rec)
    ok = [r for r in results if "frames_per_s" in r]
    if ok:
        best = max(ok, key=lambda r: r["frames_per_s"])
        print(f"best: {best['config']} at {best['frames_per_s']} f/s")


if __name__ == "__main__":
    main()
