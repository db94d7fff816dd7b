#!/usr/bin/env python3
"""r9/r10: profile-guided XLA compiler-option sweep on the flagship step.

Round 1's "paths to close the gap" named "profile-guided XLA flag tuning"
(BENCH_NOTES r1 #2) and it was never measured. Two environment findings shape
the harness:

- ``XLA_FLAGS`` is a dead end here: the axon client's XLA rejects every TPU
  compiler flag at parse ("Unknown flag in XLA_FLAGS") because compilation
  happens REMOTELY and the client build carries no TPU compiler.
- PJRT per-compile options DO reach the remote compiler and are validated
  there: ``lowered.compile(compiler_options={...})`` with a real TPU option
  compiles and runs; a bogus option name fails the remote compile with
  HTTP 500. bench.py exposes this as ``TCVAE_COMPILER_OPTIONS="k=v,k=v"``.

This sweeps the plausible single-chip knobs on the exact bench.py step
(b768, adam_lean + fast-vjp):

- ``xla_tpu_scoped_vmem_limit_kib``: raises the VMEM budget the fusion pass
  may assume, allowing larger fusion tiles — relevant because the step is
  dominated by HBM-bound fusions (Adam update chains, narrow-conv grads)
  whose tile sizes bound their achieved bandwidth.
- ``xla_tpu_enable_latency_hiding_scheduler``: overlap-oriented scheduling.
- ``xla_latency_hiding_scheduler_rerun``: scheduler effort.

Each config runs ``bench.py`` in a fresh subprocess (the tunnel is
single-client so runs are serialized; a changed option set is a fresh
remote compile, so allow long timeouts). Results append to
benchmarks/r9_results.jsonl. Options the remote compiler rejects are
recorded as failures, not fatal.

Usage: python benchmarks/r9_xla_flags.py [--only NAME]
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
    ("vmem64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "xla_tpu_scoped_vmem_limit_kib=98304"),
    ("vmem112m", "xla_tpu_scoped_vmem_limit_kib=114688"),
    ("lhs", "xla_tpu_enable_latency_hiding_scheduler=true"),
    (
        "lhs+vmem96m",
        "xla_tpu_enable_latency_hiding_scheduler=true,"
        "xla_tpu_scoped_vmem_limit_kib=98304",
    ),
    # round 2 of the sweep: fusion-adjacent options probed VALID on the
    # remote compiler, stacked on the vmem96m winner
    (
        "vmem96m+scavenge",
        "xla_tpu_scoped_vmem_limit_kib=98304,"
        "xla_tpu_scavenge_vmem_for_fusions=true",
    ),
    (
        "vmem96m+fcm",
        "xla_tpu_scoped_vmem_limit_kib=98304,"
        "xla_tpu_enable_experimental_fusion_cost_model=true",
    ),
    (
        "vmem96m+norwb",
        "xla_tpu_scoped_vmem_limit_kib=98304,xla_tpu_rwb_fusion=false",
    ),
]


def run_config(name: str, options: str, timeout: int = 2400) -> dict:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    if options:
        env["TCVAE_COMPILER_OPTIONS"] = options
    env["BENCH_BATCHES"] = "768"
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"config": name, "options": options, "error": f"timeout {timeout}s"}
    wall = time.time() - t0
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-3:]
        return {"config": name, "options": options, "error": " | ".join(tail),
                "wall_s": round(wall, 1)}
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    return {"config": name, "options": options, "frames_per_s": rec["value"],
            "wall_s": round(wall, 1)}


def main():
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    results = []
    for name, options in CONFIGS:
        if only and name != only:
            continue
        rec = run_config(name, options)
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
