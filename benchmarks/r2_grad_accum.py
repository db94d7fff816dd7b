#!/usr/bin/env python3
"""Gradient accumulation at batch 768: K microbatches per Adam update.

Round 1 measured grad-accum neutral at 2x384 (accumulator traffic offset
the Adam amortization). The economics changed: Adam is ~30 ms of the 133 ms
step at b768 and the per-microbatch accumulator cost is param-sized
(~6.6 ms at bf16), so K=2 projects ~+7% and K=4 ~+11% — measure it.

Implementation: lax.scan over K stacked microbatches accumulating bf16
grads (donated carry), one optimizer.update at the end.
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


def build_accum_step(core, optimizer, k):
    import jax
    import jax.numpy as jnp
    import optax

    def micro(carry, x_rng):
        acc, params = carry
        x_u8, rng = x_rng
        x = x_u8.astype(jnp.float32) / 255.0

        def loss_fn(p):
            loss_dict, _ = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
            return loss_dict["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        acc = jax.tree_util.tree_map(lambda a, g: a + g.astype(a.dtype), acc, grads)
        return (acc, params), loss

    def step(params, opt_state, xs_u8, rngs):
        acc0 = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)
        (acc, _), losses = jax.lax.scan(micro, (acc0, params), (xs_u8, rngs))
        grads = jax.tree_util.tree_map(lambda a: (a / k).astype(a.dtype), acc)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses[-1]

    return jax.jit(step, donate_argnums=(0, 1))


def run(k: int, batch: int = 768, steps: int = 6, warmup: int = 2):
    import jax
    import jax.numpy as jnp

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_accum_step(core, optimizer, k)
    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (k, batch, 224, 300, 3), np.uint8))
    rngs_all = jax.random.split(jax.random.PRNGKey(1), (warmup + steps) * k)

    def call(i):
        nonlocal params, opt_state
        rngs = rngs_all[i * k:(i + 1) * k]
        params, opt_state, loss = step_fn(params, opt_state, xs, rngs)
        return loss

    for i in range(warmup):
        loss = call(i)
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        loss = call(warmup + i)
    final = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    log_result(name=f"accum_k{k}_b{batch}", batch=batch, scan_k=k,
               frames_per_s=round(k * batch * steps / dt, 1),
               ms_per_step=round(1000 * dt / steps, 2))
    del params, opt_state, xs, step_fn
    gc.collect()


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["2"]:
        try:
            run(int(arg))
        except Exception as e:
            log_result(name=f"accum_k{arg}_b768", error=str(e).splitlines()[0][:300])
