#!/usr/bin/env python3
"""Headline benchmark: train + anomaly-scoring throughput, frames/sec/chip.

Target (BASELINE.md / BASELINE.json north_star): >= 10,000 frames/sec/chip at
224x300x3 on the reference config.yml flagship model (KurtosisGlobalCVAE,
latent 2000, layers [32, 64]). One step = gradient update (Adam) on the batch
PLUS per-frame anomaly z-scores from the reconstruction error — i.e. the
combined "train + score" pipeline of train.py + do_anomaly_detection.py
(reference do_anomaly_detection.py:57-117 scoring math).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 10000 (the north-star target).

Compute is bfloat16 (MXU-native) with float32 loss/score reductions; the
1.35B-parameter flagship (the 268800x4000 encoder dense dominates) holds
params and both Adam moments in bf16 (ops/adam.py adam_lean: optax kernel
structure, f32 EMA arithmetic, bf16 storage), which fits batch 512 on a
16 GB v5e — the measured throughput knee (benchmarks/r2_results.jsonl:
384 -> 4.3k, 512 -> 4.6-4.7k, 576/640 regress, 768 fails to compile).
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache (benchmarks/.xla_cache, gitignored):
# repeated bench runs skip the multi-minute flagship compile. Set BEFORE the
# package import so __init__ applies it (jax may be pre-imported, so the
# plain env var would otherwise be eaten — see CLAUDE.md).
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks", ".xla_cache"),
)

# Profile-guided compiler option (measured sweep, benchmarks/r9_xla_flags.py):
# raising the scoped-VMEM fusion budget to 96 MiB lets the fusion pass pick
# larger tiles for the HBM-bound Adam/narrow-conv fusions — +5.4% on the
# flagship step (5,701 -> 6,007 f/s; 64m +4.8%, 112m plateau, latency-hiding
# scheduler neutral). Ships as the default; TCVAE_COMPILER_OPTIONS overrides
# ("" disables). XLA_FLAGS cannot do this here: compilation is remote and the
# client XLA rejects TPU flags at parse — see utils/compile.py.
os.environ.setdefault("TCVAE_COMPILER_OPTIONS", "xla_tpu_scoped_vmem_limit_kib=98304")


def _bench_config():
    """Bench model config by BENCH_PRESET: the flagship (default), or
    'tiny' — a CPU-executable shrink used to validate the --dp sharded path
    on the virtual 8-device mesh (tests/test_bench_dp.py) so the multi-chip
    claim is one command the moment real chips appear."""
    if os.environ.get("BENCH_PRESET") == "tiny":
        cfg = _flagship_config(latent=64)
        cfg["data"]["image_size"] = [32, 32, 3]
        cfg["model"]["layers"] = [4, 8]
        cfg["model"]["decoder_dense_filters"] = 4
        return cfg
    return _flagship_config()


def _flagship_config(latent=2000):
    return {
        "data": {"image_size": [224, 300, 3]},
        "loss": {
            "kurtosis": 1.8,
            "w_kl_divergence": 0.0,
            "w_kurtosis": 1e-4,
            "w_mse": 1.0,
            "w_skew": 0.0,
            "w_x_std": 0.0,
            "w_z_l1_reg": 0.0,
        },
        "model": {
            "type": "KurtosisGlobal",
            "latent_dimensions": latent,
            "layers": [32, 64],
            "decoder_dense_filters": 32,
        },
        "training": {
            "batch_size": 256,
            "beta": 0.98,
            "learning_rate": 1e-4,
            "max_epochs": 10,
        },
    }


def build_bench_step(core, optimizer, mesh=None):
    """The combined train+score step. With ``mesh`` (``--dp N``): pure data
    parallelism over the mesh's 'data' axis — params/moments replicated,
    batch sharded, GSPMD inserts the gradient all-reduce (the scaling-book
    recipe: annotate shardings, let XLA place the collectives on ICI)."""
    import jax
    import jax.numpy as jnp
    import optax

    def step(params, opt_state, x_u8, rng, mu, sigma):
        # frames arrive uint8 from the ingest pipeline; normalization is part
        # of the on-device work (data/ingest.py semantics)
        x = x_u8.astype(jnp.float32) / 255.0

        def loss_fn(p):
            loss_dict, x_hat = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
            return loss_dict["loss"], (loss_dict, x_hat)

        grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # anomaly scoring (do_anomaly_detection.py:62-92 math): per-frame
        # channel-summed squared error, reduced over pixels, z vs train stats
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        err_reduced = jnp.sum(err, axis=(1, 2))
        z_scores = (err_reduced - mu) / sigma
        return params, opt_state, loss_dict["loss"], z_scores

    # honors TCVAE_COMPILER_OPTIONS (bench default: vmem96m, +5.4%) via the
    # shared wrapper — per-(options, signature) compile cache, unknown-option
    # fallback, donation semantics from the jit kwargs (utils/compile.py)
    from trustedai_cl_vae_ad_tpu.utils.compile import optioned_jit

    if mesh is None:
        return optioned_jit(step, donate_argnums=(0, 1))
    from trustedai_cl_vae_ad_tpu.parallel.mesh import (
        batch_sharding,
        replicated_sharding,
    )

    rep, bsh = replicated_sharding(mesh), batch_sharding(mesh)
    return optioned_jit(
        step,
        in_shardings=(rep, rep, bsh, rep, rep, rep),
        out_shardings=(rep, rep, rep, bsh),
        donate_argnums=(0, 1),
    )


def run_bench(batch_size: int, steps: int = 30, warmup: int = 5,
              n_data: int = 0, dump_hlo: str = ""):
    """Measure the train+score step. ``batch_size`` is the GLOBAL batch.

    ``n_data`` > 0 (``--dp N``): run the data-parallel sharded step over a
    1-axis mesh of the first N visible devices. ``dump_hlo``: write the
    compiled (post-SPMD-partitioning) HLO of the measured step there — the
    collectives evidence for the multi-chip path.
    """
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    config = _bench_config()
    h, w, c = config["data"]["image_size"]
    core = KurtosisGlobalCVAE(config, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    # BENCH_OPT=fp8 switches to the experimental fp8-moment Adam
    # (ops/adam8.py) for A/B measurement; default is the shipped adam_lean
    if os.environ.get("BENCH_OPT", "lean") == "fp8":
        from trustedai_cl_vae_ad_tpu.ops.adam8 import adam_fp8

        optimizer = adam_fp8(1e-4)
    else:
        optimizer = adam_lean(1e-4)  # bf16 moments, f32 EMA arithmetic
    opt_state = optimizer.init(params)

    mesh = None
    if n_data:
        from trustedai_cl_vae_ad_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            replicated_sharding,
        )

        mesh = make_mesh(n_data=n_data, n_model=1)
        rep, bsh = replicated_sharding(mesh), batch_sharding(mesh)
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
    step_fn = build_bench_step(core, optimizer, mesh=mesh)

    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch_size, h, w, c), np.uint8)
    )
    mu = jnp.float32(100.0)
    sigma = jnp.float32(10.0)
    if mesh is not None:
        x = jax.device_put(x, bsh)
        mu, sigma = jax.device_put(mu, rep), jax.device_put(sigma, rep)

    rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
    if mesh is not None:
        rngs = jax.device_put(rngs, rep)
    if dump_hlo:
        compiled = step_fn.lower(params, opt_state, x, rngs[0], mu, sigma).compile()
        with open(dump_hlo, "w") as f:
            f.write(compiled.as_text())
        # measure through the AOT executable we just compiled: with compiler
        # options set the dispatch cache already shares it, but on the plain
        # jit path (options unset) calling step_fn would compile a SECOND
        # executable — 90-200 s per shape through the remote tunnel
        step_fn = compiled
    for i in range(warmup):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    # NOTE: on some TPU runtimes block_until_ready does not synchronize; a
    # device->host scalar fetch is the reliable fence (verified vs known-FLOPs
    # matmul chain).
    float(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[warmup + i], mu, sigma)
    last_loss = float(loss)  # sync fence: whole step chain is sequential
    dt = time.perf_counter() - t0
    assert np.isfinite(last_loss), "non-finite loss in bench"
    return batch_size * steps / dt


def _wait_for_tpu(budget_s: int = 1800, probe_timeout: int = 180) -> None:
    """The tunnel sometimes wedges outright (r8): device init sleeps forever
    with zero CPU, so an in-process attempt would hang the whole bench. Probe
    with a tiny jit in a SUBPROCESS (killable on timeout) until the tunnel
    responds; give up after ``budget_s``. Skipped on forced-CPU runs."""
    if os.environ.get("TCVAE_PLATFORM") == "cpu":
        return
    import subprocess

    code = ("import jax.numpy as jnp;"
            "print(float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum()))")
    deadline = time.time() + budget_s
    last = None
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", code], timeout=probe_timeout, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
            )
            return
        except subprocess.TimeoutExpired:
            why = f"probe hung >{probe_timeout}s (tunnel outage)"
        except subprocess.CalledProcessError as e:
            # a FAST failure is not an outage — surface the real error (bad
            # install, plugin registration, ...) instead of looping silently
            tail = (e.stderr or "").strip().splitlines()
            why = "probe errored: " + (tail[-1] if tail else f"exit {e.returncode}")
        if why != last:
            print(f"tpu {why} — retrying every 60 s", file=sys.stderr)
            last = why
        if time.time() > deadline:
            raise RuntimeError(
                f"TPU unreachable for {budget_s}s; last: {why} — an "
                "environment failure, not a model/bench failure")
        time.sleep(60)


def _retry_in_fresh_process() -> bool:
    """The tunneled TPU plugin occasionally fails to register at import; a
    fresh process usually succeeds. Re-exec once (flagged via env)."""
    if os.environ.get("BENCH_RETRIED"):
        return False
    os.environ["BENCH_RETRIED"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--dp", type=int, default=int(os.environ.get("BENCH_DP", "0")),
        metavar="N",
        help="Data-parallel sharded step over the first N visible devices "
             "(0/absent = the single-chip headline). Per-chip batch stays "
             "the measured knee; the global batch is N x that. The north "
             "star >= 10k f/s is an AGGREGATE multi-chip target "
             "(BASELINE.md: single-chip is roofline-closed at ~6.0k, 82.6% "
             "attainment) — this is the one-command demonstration path when "
             "N real chips are visible (validated on the 8-device virtual "
             "CPU mesh: tests/test_bench_dp.py)")
    parser.add_argument(
        "--dump-hlo", type=str, default="", metavar="PATH",
        help="Write the compiled (post-SPMD) HLO of the measured step — the "
             "collectives evidence for --dp")
    args = parser.parse_args()
    # with the reverse-free ConvTranspose VJP (ops/convt.py), 768 compiles
    # and is the measured best (896 crashes the compiler); smaller batches
    # are the OOM fallbacks
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "768,512,384").split(",")]
    _wait_for_tpu()
    n_data = max(0, int(args.dp))
    if n_data:
        # the package import applies TCVAE_PLATFORM/TCVAE_CPU_DEVICES BEFORE
        # the first jax op — a bare jax.devices() here would pin the real
        # backend even on forced-CPU validation runs (CLAUDE.md)
        import trustedai_cl_vae_ad_tpu  # noqa: F401

        import jax

        avail = len(jax.devices())
        assert n_data <= avail, f"--dp {n_data} > {avail} visible devices"
    fps = None
    for b in batches:
        try:
            # --dp: per-chip batch stays at the single-chip knee
            fps = run_bench(b * (n_data or 1), n_data=n_data,
                            dump_hlo=args.dump_hlo)
            break
        except Exception as e:  # OOM at large batch: fall back
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or "exceeds" in msg:
                continue
            if "not in the list of known backends" in msg or "Unable to initialize backend" in msg:
                import time as _time

                _time.sleep(20)
                _retry_in_fresh_process()
            raise
    if fps is None:
        raise RuntimeError("benchmark failed at all batch sizes")
    preset = " tiny-preset" if os.environ.get("BENCH_PRESET") == "tiny" else ""
    cfg = _bench_config()
    h, w, _c = cfg["data"]["image_size"]
    latent = int(cfg["model"]["latent_dimensions"])
    if n_data:
        out = {
            "metric": f"train+score frames/sec AGGREGATE over {n_data} "
                      f"devices @{h}x{w} (KurtosisGlobalCVAE latent-{latent}, "
                      f"dp={n_data}){preset}",
            "value": round(fps, 1),
            "unit": "frames/sec",
            # the >=10k north star is the aggregate multi-chip target
            # (BASELINE.md "North-star position", BENCH_NOTES r17)
            "vs_baseline": round(fps / 10000.0, 4),
            "devices": n_data,
            "per_device": round(fps / n_data, 1),
        }
    else:
        out = {
            "metric": f"train+score frames/sec/chip @{h}x{w} "
                      f"(KurtosisGlobalCVAE latent-{latent}){preset}",
            "value": round(fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 10000.0, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
