#!/usr/bin/env python3
"""Round-2 perf experiments: Adam moment memory vs batch size vs dispatch.

Runs the bench train+score step (bench.py semantics) under:
  * baseline: optax.adam(mu bf16, nu f32) at batch 384 (round-1 config)
  * adam_lean (bf16 mu+nu) at batch 384 / 512 / 768 / 1024
  * scan-of-K-steps in one dispatch at the best batch (dispatch amortization)

Appends one JSON line per experiment to benchmarks/r2_results.jsonl so a
crash/OOM loses nothing. Run foreground from the repo root (single TPU
client; see CLAUDE.md).
"""

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r2_results.jsonl")


def log_result(**kw):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print("RESULT", json.dumps(kw), flush=True)


def build_step(core, optimizer):
    import jax
    import jax.numpy as jnp
    import optax

    def step(params, opt_state, x_u8, rng, mu, sigma):
        x = x_u8.astype(jnp.float32) / 255.0

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

    return jax.jit(step, donate_argnums=(0, 1))


def build_scan_step(core, optimizer, k):
    """K full train steps (K Adam updates) in ONE dispatch via lax.scan —
    models a device-resident input queue of K batches."""
    import jax
    import jax.numpy as jnp
    import optax

    def one(carry, inp):
        params, opt_state = carry
        x_u8, rng = inp
        x = x_u8.astype(jnp.float32) / 255.0

        def loss_fn(p):
            loss_dict, x_hat = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
            return loss_dict["loss"], (loss_dict, x_hat)

        grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        z = (jnp.sum(err, axis=(1, 2)) - 100.0) / 10.0
        return (params, opt_state), (loss_dict["loss"], z)

    def stepk(params, opt_state, xs_u8, rngs):
        (params, opt_state), (losses, zs) = jax.lax.scan(one, (params, opt_state), (xs_u8, rngs))
        return params, opt_state, losses[-1], zs

    return jax.jit(stepk, donate_argnums=(0, 1))


def run_experiment(name, batch, optimizer_factory, steps=12, warmup=3, scan_k=0):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from bench import _flagship_config

    t_setup = time.perf_counter()
    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = optimizer_factory()
    opt_state = optimizer.init(params)

    rng_np = np.random.RandomState(0)
    if scan_k:
        step_fn = build_scan_step(core, optimizer, scan_k)
        x = jnp.asarray(rng_np.randint(0, 256, (scan_k, batch, 224, 300, 3), np.uint8))
        rngs_all = jax.random.split(jax.random.PRNGKey(1), (warmup + steps) * scan_k)
        def call(i):
            nonlocal params, opt_state
            rngs = rngs_all[i * scan_k : (i + 1) * scan_k]
            params, opt_state, loss, z = step_fn(params, opt_state, x, rngs)
            return loss
        frames_per_call = batch * scan_k
    else:
        step_fn = build_step(core, optimizer)
        x = jnp.asarray(rng_np.randint(0, 256, (batch, 224, 300, 3), np.uint8))
        mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
        rngs_all = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
        def call(i):
            nonlocal params, opt_state
            params, opt_state, loss, z = step_fn(params, opt_state, x, rngs_all[i], mu, sigma)
            return loss
        frames_per_call = batch

    t_compile0 = time.perf_counter()
    loss = None
    for i in range(warmup):
        loss = call(i)
    fence = float(loss)  # device->host fetch: the only reliable fence here
    t_warm = time.perf_counter()

    t0 = time.perf_counter()
    for i in range(steps):
        loss = call(warmup + i)
    final = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final), f"{name}: non-finite loss"
    fps = frames_per_call * steps / dt
    log_result(
        name=name, batch=batch, scan_k=scan_k, steps=steps,
        frames_per_s=round(fps, 1),
        ms_per_step=round(1000 * dt / steps, 2),
        warmup_s=round(t_warm - t_compile0, 1),
        setup_s=round(t_compile0 - t_setup, 1),
        loss=final,
    )
    # free HBM before the next experiment
    del params, opt_state, x, step_fn
    gc.collect()
    return fps


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    print("devices:", jax.devices(), flush=True)
    base_opt = lambda: optax.adam(1e-4, mu_dtype=jnp.bfloat16)
    lean_opt = lambda: adam_lean(1e-4)  # bf16 mu + bf16 nu, RTN
    sr_opt = lambda: adam_lean(1e-4, stochastic_round_nu=True)

    plan = [
        ("baseline_optax_b384", 384, base_opt, 0),
        ("baseline_optax_b512", 512, base_opt, 0),
        ("lean_b384", 384, lean_opt, 0),
        ("lean_b512", 512, lean_opt, 0),
        ("lean_b768", 768, lean_opt, 0),
        ("lean_b640", 640, lean_opt, 0),
        ("lean_b576", 576, lean_opt, 0),
        ("lean_b896", 896, lean_opt, 0),
        ("lean_b1024", 1024, lean_opt, 0),
        ("lean_sr_b512", 512, sr_opt, 0),
        ("scan4_b512", 512, lean_opt, 4),
        ("scan4_b768", 768, lean_opt, 4),
    ]
    only = set(sys.argv[1:])
    if only:
        plan = [p for p in plan if p[0] in only]
    best = (None, 0.0)
    for name, batch, opt, k in plan:
        if k:
            try:
                run_experiment(name, batch, opt, scan_k=k, steps=4, warmup=2)
            except Exception as e:
                log_result(name=name, batch=batch, error=str(e).splitlines()[0][:300])
            continue
        try:
            fps = run_experiment(name, batch, opt, scan_k=k)
            if fps > best[1]:
                best = ((name, batch, opt), fps)
        except Exception as e:
            msg = str(e).splitlines()[0][:300]
            log_result(name=name, batch=batch, error=msg)
            if "RESOURCE_EXHAUSTED" not in msg and "memory" not in msg.lower():
                raise
            gc.collect()

    if best[0] is not None:
        print(f"best: {best[0][0]} @ {best[1]:.0f} frames/s", flush=True)


if __name__ == "__main__":
    main()
