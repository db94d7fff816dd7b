#!/usr/bin/env python3
"""Roofline-attainment report from a persisted jax.profiler trace.

For every XLA op on the device timeline, computes its attainment of its OWN
roofline bound — max(flops/peak_flops, bytes/peak_hbm_bw) — using the
profiler's per-op flops/bytes_accessed stats, and the time-weighted average
across the step. This is the "is the graph hardware-bound?" number: 100%
means every op runs at the speed its FLOPs or HBM traffic physically allows.

    python benchmarks/roofline_report.py benchmarks/traces/train_step_b768 \
        [--steps 3] [--out report.json]

Peaks default to TPU v5e (197 bf16 TFLOPS, 819 GB/s HBM).
Requires tensorflow (xplane proto) — present in this environment.
"""

import argparse
import glob
import json


def report(trace_dir: str, steps: int = 3, peak_tflops: float = 197.0,
           peak_hbm_gbs: float = 819.0) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    peak_f = peak_tflops * 1e12
    peak_b = peak_hbm_gbs * 1e9

    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        lines = [l for l in plane.lines if l.name == "XLA Ops"]
        assert lines, "no 'XLA Ops' line in trace"
        agg = {}
        for ev in lines[0].events:
            md = ev_meta[ev.metadata_id]
            if md.name.startswith("jit_") or md.name.isdigit():
                continue
            stats = {
                stat_names.get(s.metadata_id, "?"):
                (s.str_value or s.int64_value or s.uint64_value
                 or s.double_value or s.ref_value)
                for s in md.stats
            }
            a = agg.setdefault(md.name, [0.0,
                                         float(stats.get("flops", 0) or 0),
                                         float(stats.get("bytes_accessed", 0) or 0)])
            a[0] += ev.duration_ps / 1e12
        total_s = sum(a[0] for a in agg.values())
        bound_s = 0.0
        tot_flops = 0.0
        tot_bytes = 0.0
        ops = []
        for name, (d, fl, by) in agg.items():
            if d <= 0:
                continue
            util = max(steps * fl / d / peak_f, steps * by / d / peak_b)
            bound_s += d * min(util, 1.0)
            tot_flops += steps * fl
            tot_bytes += steps * by
            ops.append({"op": name[:140], "ms_per_step": round(d / steps * 1e3, 3),
                        "roofline_attainment": round(min(util, 1.0), 4)})
        ops.sort(key=lambda o: -o["ms_per_step"])
        return {
            "trace": trace_dir,
            "steps": steps,
            "device_busy_ms_per_step": round(total_s / steps * 1e3, 2),
            "time_weighted_roofline_attainment": round(bound_s / total_s, 4),
            "avg_tflops": round(tot_flops / total_s / 1e12, 1),
            "avg_hbm_gbs": round(tot_bytes / total_s / 1e9, 1),
            "peaks": {"tflops": peak_tflops, "hbm_gbs": peak_hbm_gbs},
            "top_ops": ops[:20],
        }
    raise RuntimeError("no /device:TPU:0 plane in trace")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()
    r = report(args.trace_dir, steps=args.steps)
    out = args.out or f"{args.trace_dir.rstrip('/')}_roofline.json"
    with open(out, "w") as f:
        json.dump(r, f, indent=1)
    print(f"device busy {r['device_busy_ms_per_step']} ms/step; "
          f"time-weighted roofline attainment "
          f"{100 * r['time_weighted_roofline_attainment']:.1f}% "
          f"(avg {r['avg_tflops']} TFLOPS, {r['avg_hbm_gbs']} GB/s) -> {out}")


if __name__ == "__main__":
    main()
