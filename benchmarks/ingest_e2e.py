#!/usr/bin/env python3
"""Ingest-inclusive end-to-end training benchmark: train the flagship FROM DISK.

The headline bench (bench.py) times the device step on a device-resident
batch; the north-star metric (BASELINE.md) is the train+score *pipeline*.
This harness measures the missing piece — the reference's own bottleneck
(its single-threaded cv2.imread generator, raite_loader.py:129-153) — through
OUR pipeline: on-disk frames -> parallel decode (data/pipeline.py /
runtime_native) -> batch -> device_prefetch (data/ingest.py) -> the flagship
train+score step, in three feeding regimes:

  cold          disk decode + host->device upload + step   (epoch 1)
  host_cached   upload + step       (reference .cache() semantics, epoch 2+)
  device_cached step only           (data.device_cache, epoch 2+ — TPU-native)

plus per-stage microbenchmarks (decode f/s per backend+format, upload MB/s)
and a host-core scaling model: how many decode cores a real host needs to
feed the measured device step rate. On THIS VM two environment ceilings cap
the cold/host_cached numbers and are reported as such, not as engine limits:
nproc==1 (decode) and the tunneled TPU's ~40 MB/s host->device upload
(BENCH_NOTES r7 isolation; real PCIe is 2-3 orders faster).

Writes benchmarks/INGEST_E2E.json + appends benchmarks/ingest_results.jsonl.
Usage:
  python benchmarks/ingest_e2e.py                  # flagship, TPU
  TCVAE_PLATFORM=cpu python benchmarks/ingest_e2e.py --tiny   # CPU smoke
Serialize with all other TPU work (single-client tunnel).
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)
os.environ.setdefault("TCVAE_COMPILER_OPTIONS", "xla_tpu_scoped_vmem_limit_kib=98304")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_JSON = os.path.join(HERE, "INGEST_E2E.json")
OUT_JSONL = os.path.join(HERE, "ingest_results.jsonl")


# ---------------------------------------------------------------------------
# Dataset prep: scene-like frames (gradients + boxes + mild noise) so PNG/JPEG
# codecs behave like they do on camera frames, not on incompressible noise.
# ---------------------------------------------------------------------------

def make_scene(h: int, w: int, idx: int, rng: np.random.RandomState) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            80 + 60 * np.sin(xx / w * 3.1 + idx * 0.05),
            90 + 50 * np.cos(yy / h * 2.7),
            70 + 40 * np.sin((xx + yy) / (h + w) * 4.0),
        ],
        axis=-1,
    )
    img = base + rng.normal(0, 4.0, base.shape).astype(np.float32)
    for _ in range(4):  # a few moving rectangles
        rh, rw = rng.randint(h // 8, h // 3), rng.randint(w // 8, w // 3)
        y0, x0 = rng.randint(0, h - rh), rng.randint(0, w - rw)
        img[y0 : y0 + rh, x0 : x0 + rw] += rng.randint(-50, 50, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def write_frames(root: str, n: int, h: int, w: int, fmt: str) -> list:
    import cv2

    d = os.path.join(root, f"{fmt}_{w}x{h}")
    os.makedirs(d, exist_ok=True)
    paths = []
    for i in range(n):
        p = os.path.join(d, f"frame_{i:05d}.{fmt}")
        paths.append(p)
        if not os.path.exists(p):  # prep is reusable across runs: each frame
            # draws from its own per-index stream, so skipping existing files
            # cannot shift the content of the ones still to be written
            cv2.imwrite(
                p,
                cv2.cvtColor(
                    make_scene(h, w, i, np.random.RandomState(100003 + i)),
                    cv2.COLOR_RGB2BGR,
                ),
            )
    return paths


# ---------------------------------------------------------------------------
# Stage microbenchmarks (host only)
# ---------------------------------------------------------------------------

def bench_decode(paths: list, hw, reps: int = 1) -> dict:
    """frames/s for each decode backend. nproc==1 here => numbers are per-core."""
    from trustedai_cl_vae_ad_tpu.data import native
    from trustedai_cl_vae_ad_tpu.data.pipeline import ParallelDecodeIterable

    out = {}
    if native.available():
        t0 = time.perf_counter()
        for _ in range(reps):
            batch, ok = native.decode_batch(paths, hw)
        dt = time.perf_counter() - t0
        assert ok.all(), f"native decode failed on {int((~ok).sum())} frames"
        out["native_pool_fps"] = round(reps * len(paths) / dt, 1)
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for img, fp in ParallelDecodeIterable(paths, num_workers=8):
            n += 1
    dt = time.perf_counter() - t0
    assert n == reps * len(paths)
    out["cv2_threadpool_fps"] = round(n / dt, 1)
    return out


def bench_upload(batch_shape, n_batches: int = 8) -> dict:
    """Host->device uint8 transfer rate. Bounded total bytes: the tunnel
    leaks host RSS ~= uploaded bytes (BENCH_NOTES r7), so keep this small."""
    import jax

    x = np.random.RandomState(0).randint(0, 256, batch_shape, np.uint8)
    # warmup transfer + fence
    d = jax.device_put(x)
    float(jax.numpy.float32(d[0, 0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(n_batches):
        d = jax.device_put(x)
    float(jax.numpy.float32(d[0, 0, 0, 0]))  # fence (block_until_ready lies here)
    dt = time.perf_counter() - t0
    frames = n_batches * batch_shape[0]
    return {
        "upload_MBps": round(n_batches * x.nbytes / dt / 1e6, 1),
        "upload_fps_u8": round(frames / dt, 1),
        "frame_bytes_u8": int(x.nbytes // batch_shape[0]),
    }


# ---------------------------------------------------------------------------
# The e2e loop: product ingest path -> flagship train+score step
# ---------------------------------------------------------------------------

def build_f32_step(core, optimizer):
    """bench.py's train+score step, taking the ingest pipeline's f32 output."""
    import jax
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.utils.compile import optioned_jit

    def step(params, opt_state, x, rng, mu, sigma):
        def loss_fn(p):
            loss_dict, x_hat = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
            return loss_dict["loss"], (loss_dict, x_hat)

        grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        err_reduced = jnp.sum(err, axis=(1, 2))
        z_scores = (err_reduced - mu) / sigma
        return params, opt_state, loss_dict["loss"], z_scores

    return optioned_jit(step, donate_argnums=(0, 1))


def run_e2e(stream, step_fn, state, steps: int, label: str) -> dict:
    """Consume `steps` batches from `stream` through the train+score step.

    Steps are dispatched ASYNC and fenced once at the end — the params chain
    already serializes device execution, and a per-step device->host fence
    through this tunnel costs ~200 ms RTT (measured: it quadrupled the
    apparent b384 step). `wait` is host time blocked on the pipeline
    (decode/upload backpressure); stall_fraction = wait / wall."""
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    params, opt_state, rngs, mu, sigma = state
    # Drain the device queue before timing: device_put/cache-fill uploads from
    # setup are ASYNC on this runtime, and an unfenced backlog bleeds into the
    # timed window (a 310 MB f32 control batch measured as +340 ms/step).
    device_fence(params)
    waits = []
    done = 0
    frames = 0
    t_total0 = time.perf_counter()
    it = iter(stream)
    while done < steps:
        t0 = time.perf_counter()
        batch = next(it, None)
        waits.append(time.perf_counter() - t0)
        if batch is None:
            it = iter(stream)  # next epoch
            continue
        x = batch["image"] if isinstance(batch, dict) else batch
        params, opt_state, loss, z = step_fn(
            params, opt_state, x, rngs[done % len(rngs)], mu, sigma
        )
        frames += int(x.shape[0])
        done += 1
    lossf = float(loss)  # single fence: whole step chain is sequential
    total = time.perf_counter() - t_total0
    assert np.isfinite(lossf)
    stall = sum(waits) / total
    rec = {
        "phase": label,
        "fps": round(frames / total, 1),
        "steps": steps,
        "wall_s": round(total, 2),
        "stall_fraction": round(stall, 4),
        "mean_wait_ms": round(1e3 * np.mean(waits), 1),
        "mean_step_ms": round(1e3 * (total - sum(waits)) / steps, 1),
    }
    print(json.dumps(rec))
    return rec, (params, opt_state, rngs, mu, sigma)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke test scale")
    ap.add_argument("--batch", type=int, default=384,
                    help="flagship e2e batch (384: f32 pipeline batches + cache "
                         "fit next to the 1.34B-param train state; 768 is the "
                         "device-resident headline but leaves no HBM for input)")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--frames-dir", default="/tmp/tcvae_ingest_frames")
    ap.add_argument("--decode-frames", type=int, default=512,
                    help="frames for the decode microbench")
    ap.add_argument("--keep-frames", action="store_true")
    ap.add_argument("--phases", default="control,cold,host,device",
                    help="comma list of e2e phases to run "
                         "(control,cold,host,device)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from trustedai_cl_vae_ad_tpu.data.ingest import DeviceCachedStream
    from trustedai_cl_vae_ad_tpu.data.loader import DeviceStream
    from trustedai_cl_vae_ad_tpu.data.pipeline import (
        CachedDataset,
        ParallelDecodeIterable,
        batched,
    )
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    if args.tiny:
        h, w, latent, layers, ddf = 64, 64, 32, [8, 16], 8
        args.batch, args.steps = 16, 4
    else:
        h, w, latent, layers, ddf = 224, 300, 2000, [32, 64], 32

    results = {"config": {"batch": args.batch, "steps": args.steps,
                          "image": [h, w, 3], "nproc": os.cpu_count()}}

    # -- dataset on disk ----------------------------------------------------
    n_frames = args.batch * args.steps
    t0 = time.perf_counter()
    png_paths = write_frames(args.frames_dir, n_frames, h, w, "png")
    jpg_paths = write_frames(args.frames_dir, args.decode_frames, h, w, "jpg")
    print(f"prep: {n_frames} png + {args.decode_frames} jpg in "
          f"{time.perf_counter()-t0:.1f}s at {args.frames_dir}")

    # -- stage 1: host decode -----------------------------------------------
    results["decode"] = {
        "png": bench_decode(png_paths[: args.decode_frames], (h, w)),
        "jpg": bench_decode(jpg_paths, (h, w)),
    }
    print(json.dumps({"decode": results["decode"]}))

    # -- stage 2: host->device upload ----------------------------------------
    up_batch = min(args.batch, 128)
    results["upload"] = bench_upload((up_batch, h, w, 3))
    print(json.dumps({"upload": results["upload"]}))

    # -- flagship model + step -----------------------------------------------
    cfg = bench._flagship_config(latent)
    cfg["data"]["image_size"] = [h, w, 3]
    cfg["model"]["layers"] = layers
    cfg["model"]["decoder_dense_filters"] = ddf
    core = KurtosisGlobalCVAE(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_f32_step(core, optimizer)
    rngs = jax.random.split(jax.random.PRNGKey(1), 64)
    state = (params, opt_state, rngs, jnp.float32(100.0), jnp.float32(10.0))

    image_size = [h, w, 3]

    def decode_stream():
        return batched(
            ParallelDecodeIterable(png_paths, num_workers=8),
            args.batch,
            drop_remainder=True,
        )

    class _Reiterable:
        def __init__(self, factory):
            self.factory = factory

        def __iter__(self):
            return iter(self.factory())

    # warmup: compile the step on one pipeline batch (excluded from timings)
    warm_it = iter(DeviceStream(_Reiterable(decode_stream), image_size))
    wb = next(warm_it)
    p2, o2, loss, _ = step_fn(state[0], state[1], wb["image"], rngs[0],
                              state[3], state[4])
    float(loss)
    state = (p2, o2, rngs, state[3], state[4])
    # release the abandoned prefetcher's in-flight device batches promptly
    warm_it.close() if hasattr(warm_it, "close") else None
    del wb, warm_it

    import gc

    phases = set(args.phases.split(","))

    # -- phase 0: control (device-resident f32 batch, no pipeline) ------------
    # Self-calibration against bench.py: the SAME step on one reused
    # device-resident batch. Environment throughput swings 15%+ run-to-run
    # (r15: the identical f32 step measured 75 and then 180+ ms across
    # sessions while host decode/upload benches degraded in lockstep) — a
    # per-run control makes pipeline overhead separable from machine state.
    if "control" in phases:
        from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

        x_ctl = jax.device_put(
            jnp.asarray(
                np.random.RandomState(7).rand(args.batch, h, w, 3), jnp.float32
            )
        )
        device_fence(x_ctl)  # the 310 MB upload is async: keep it out of the timing

        class _CtlStream:
            def __iter__(self):
                while True:
                    yield {"image": x_ctl}

        rec_ctl, state = run_e2e(_CtlStream(), step_fn, state,
                                 args.steps * 3, "control_device_step")
        results["control"] = rec_ctl
        del x_ctl
        gc.collect()

    # -- phase A: cold (disk decode + upload + step) --------------------------
    if "cold" in phases:
        cold_stream = DeviceStream(_Reiterable(decode_stream), image_size)
        rec_cold, state = run_e2e(cold_stream, step_fn, state, args.steps, "cold")
        results["cold"] = rec_cold
        del cold_stream
        gc.collect()

    # -- phase B: host-RAM cache (reference .cache(): decode skipped) --------
    if "host" in phases:
        host_cached = CachedDataset(decode_stream)
        list(host_cached)  # fill outside the timed region
        host_stream = DeviceStream(host_cached, image_size)
        rec_host, state = run_e2e(host_stream, step_fn, state, args.steps, "host_cached")
        results["host_cached"] = rec_host
        del host_stream, host_cached
        gc.collect()

    # -- phase C: HBM-resident cache (data.device_cache) ---------------------
    if "device" not in phases:
        _finish(results, args)
        return
    cache_batches = max(2, min(4, args.steps))
    short = png_paths[: args.batch * cache_batches]

    def short_stream():
        return batched(
            ParallelDecodeIterable(short, num_workers=8), args.batch, drop_remainder=True
        )

    dev_stream = DeviceCachedStream(
        _Reiterable(short_stream), image_size, max_bytes=8 << 30
    )
    for _ in iter(dev_stream):  # epoch 1: fill (cold, untimed)
        pass
    assert dev_stream._cache is not None, "device cache did not fill"
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    for cb in dev_stream._cache:  # fills are async uploads: fence them out
        device_fence(cb["image"])
    # 3x steps: amortize the single end-fence tunnel RTT over more steps
    rec_dev, state = run_e2e(dev_stream, step_fn, state, args.steps * 3, "device_cached")
    results["device_cached"] = rec_dev

    _finish(results, args)


def _finish(results, args):
    rec_dev = results.get("device_cached")
    if rec_dev is not None:
        dev_fps = rec_dev["fps"]
        frame_b = results["upload"]["frame_bytes_u8"]
        best_decode = max(
            v for fmt in results["decode"].values() for v in fmt.values()
        )
        ctl = results.get("control")
        results["scaling_model"] = {
            "device_step_fps": dev_fps,
            "control_fps": ctl["fps"] if ctl else None,
            "pipeline_overhead_vs_control": (
                round(ctl["fps"] / dev_fps - 1.0, 4) if ctl else None
            ),
            "decode_cores_needed_at_device_rate": round(dev_fps / best_decode, 2),
            "decode_fps_per_core_best": best_decode,
            "upload_GBps_needed_at_device_rate": round(dev_fps * frame_b / 1e9, 3),
            "tunnel_upload_fps_ceiling": results["upload"]["upload_fps_u8"],
            "note": (
                "decode f/s measured on this 1-core VM == per-core rate; a real "
                "multi-core host needs ceil(cores) decode workers "
                "(data/pipeline.py fans out; runtime_native pool scales with "
                "hardware_concurrency). Upload need is far below PCIe (~10-30 "
                "GB/s); the tunnel's ~40 MB/s is this environment's ceiling and "
                "bounds the cold/host_cached phases above."
            ),
        }
        print(json.dumps({"scaling_model": results["scaling_model"]}, indent=2))

    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=2)
    with open(OUT_JSONL, "a") as f:
        f.write(json.dumps({"ts": time.time(), **results}) + "\n")
    print(f"wrote {OUT_JSON}")

    if not args.keep_frames:
        shutil.rmtree(args.frames_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
