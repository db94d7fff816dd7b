#!/usr/bin/env python3
"""Compiled-evidence projection for the multi-chip path to 10k frames/s.

Single-chip flagship training is measured closed at ~5.7k frames/s
(BENCH_NOTES r5: 78.3% time-weighted roofline attainment, every named
alternative measured). The path to the 10k north star is data parallelism;
this script replaces the hand-wave with two artifacts:

  1. COMPILED COLLECTIVE STRUCTURE: jit the composed dp x tp x zero1 train
     step (the layout shipped in __graft_entry__.dryrun_multichip) on a
     virtual 2-device data mesh, and extract every collective op XLA's SPMD
     partitioner inserted from the optimized HLO — proof of the schedule
     (gradient reduce-scatter/all-reduce + zero1 param all-gather), not an
     assumption about it.
  2. FLAGSHIP-SCALE TIMING PROJECTION: collective bytes scale with the
     1.344B-param tree, not the toy model, so project the per-step
     collective time analytically over ICI and combine with the MEASURED
     single-chip step (136.4 ms at batch 768) for 1/2/4-chip throughput.

Writes benchmarks/MULTICHIP_PROJECTION.json. Pure CPU (virtual devices).
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

# measured single-chip numbers (BENCH_NOTES r10: b768 + adam_lean + fast-vjp
# + the shipped vmem96m compiler option, 6,008 f/s;
# traces/train_step_b768_vmem96m_*)
MEASURED_STEP_MS = 127.8
MEASURED_BATCH = 768
PARAM_COUNT = 1.344e9
BYTES_PER_PARAM = 2  # bf16

# v5e ICI: 4 links/chip x ~100 GB/s usable per direction is the public
# ballpark; BENCH_NOTES has carried ~2 ms for the 2.7 GB bf16 gradient
# all-reduce, i.e. ~1.35 TB/s effective algorithm bandwidth on a 2-chip
# ring. Project with a CONSERVATIVE 400 GB/s effective and report the
# optimistic figure alongside.
ICI_EFFECTIVE_GBS = {"conservative": 400.0, "optimistic": 1350.0}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, make_optimizer
    from trustedai_cl_vae_ad_tpu.parallel.dp import build_train_step
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh, replicate
    from trustedai_cl_vae_ad_tpu.parallel.zero import zero1_shardings

    config = {
        "data": {"image_size": [32, 48, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisGlobal", "latent_dimensions": 16,
                  "layers": [4, 8], "decoder_dense_filters": 4},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-4,
                     "max_epochs": 1},
    }
    core = KurtosisGlobalCVAE(config)
    optimizer = make_optimizer(1e-4)

    # 2-device data mesh + zero1 (the scaling configuration under test)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    params = replicate(core.init(jax.random.PRNGKey(0)), mesh)
    opt0 = optimizer.init(params)
    osh = zero1_shardings(opt0, mesh, min_elems=1)
    opt_state = jax.device_put(opt0, osh)
    step = build_train_step(core, optimizer, mesh, opt_state_shardings=osh)

    x = np.zeros((8, 32, 48, 3), np.float32)
    lowered = step.lower(params, opt_state, x, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # every collective the partitioner inserted, with shapes
    coll_re = re.compile(
        r"%?\S*\s*=\s*(\S+)\s+(all-reduce|reduce-scatter|all-gather|"
        r"all-to-all|collective-permute)\(", re.I)
    collectives = {}
    for line in hlo.splitlines():
        m = coll_re.search(line)
        if m:
            shape, kind = m.group(1), m.group(2).lower()
            collectives.setdefault(kind, []).append(shape)
    summary = {k: {"count": len(v), "shapes": sorted(set(v))[:8]}
               for k, v in collectives.items()}
    print(json.dumps({"compiled_collectives_2dev": summary}, indent=1))
    assert collectives, "SPMD partitioner inserted no collectives?!"

    # flagship-scale projection: gradient reduction moves ~param_bytes over
    # ICI per step (ring all-reduce: 2*(n-1)/n * bytes; zero1's
    # reduce-scatter + all-gather is the same total)
    grad_bytes = PARAM_COUNT * BYTES_PER_PARAM
    rows = []
    for chips in (1, 2, 4):
        row = {"chips": chips, "global_batch": MEASURED_BATCH * chips}
        for label, gbs in ICI_EFFECTIVE_GBS.items():
            if chips == 1:
                coll_ms = 0.0
            else:
                coll_ms = 2 * (chips - 1) / chips * grad_bytes / (gbs * 1e6)
            # collectives overlap poorly with the Adam tail; assume NO
            # overlap (worst case) — the compute step time is per chip
            step_ms = MEASURED_STEP_MS + coll_ms
            row[label] = {
                "collective_ms": round(coll_ms, 2),
                "step_ms": round(step_ms, 2),
                "frames_per_s": round(1000.0 * MEASURED_BATCH * chips / step_ms, 0),
            }
        rows.append(row)

    out = {
        "note": "compiled collective structure from the real composed train "
                "step on a virtual 2-device mesh; timing projected from the "
                "MEASURED 136.4 ms single-chip b768 step + analytic ring "
                "all-reduce over ICI (no overlap assumed)",
        "compiled_collectives_2dev": summary,
        "projection": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MULTICHIP_PROJECTION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
