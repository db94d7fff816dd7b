#!/usr/bin/env python3
"""r9: batch 896/1024 attempts — fp8 moments (+2.69 GB freed) and selective
remat vs the activation-memory wall.

BENCH_NOTES r3 closed the chunked-loss route: the b896 compile crash is bf16
ACTIVATION memory (convT2 out [896,224,300,32] bf16 = 3.85 GB) on top of the
10.8 GB optimizer footprint. Two levers this round:

- ``--opt fp8``: ops/adam8.py moments are 1 byte/elem — optimizer footprint
  10.76 -> 8.07 GB, freeing 2.69 GB for activations.
- ``--remat dots``: jax.checkpoint(policy=dots_with_no_batch_dims_saveable)
  around the loss: conv activations are recomputed in the bwd pass (cheap —
  the narrow convs are lane-padding-bound, ~10-13 ms of recompute) while the
  big GEMM outputs are saved.

Measures the full bench.py step (train + score). Appends to r9_results.jsonl.

Usage: python benchmarks/r9_big_batch.py --batch 896 [--opt fp8] [--remat dots]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r9_results.jsonl")


def build_step(core, optimizer, remat: str):
    import jax
    import jax.numpy as jnp
    import optax

    def loss_fn(p, x, rng):
        loss_dict, x_hat = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
        return loss_dict["loss"], (loss_dict, x_hat)

    if remat == "dots":
        loss_fn = jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif remat == "all":
        loss_fn = jax.checkpoint(loss_fn)

    def step(params, opt_state, x_u8, rng, mu, sigma):
        x = x_u8.astype(jnp.float32) / 255.0
        grads, (loss_dict, x_hat) = jax.grad(
            lambda p: loss_fn(p, x, rng), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        err_reduced = jnp.sum(err, axis=(1, 2))
        z_scores = (err_reduced - mu) / sigma
        return params, opt_state, loss_dict["loss"], z_scores

    return jax.jit(step, donate_argnums=(0, 1))


def run(batch: int, opt_name: str, remat: str, steps=20, warmup=3):
    import jax
    import jax.numpy as jnp

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    if opt_name == "fp8":
        from trustedai_cl_vae_ad_tpu.ops.adam8 import adam_fp8

        optimizer = adam_fp8(1e-4)
    else:
        from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

        optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_step(core, optimizer, remat)

    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 224, 300, 3), np.uint8)
    )
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
    for i in range(warmup):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    float(loss)  # fence
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[warmup + i], mu, sigma)
    last = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(last)
    return batch * steps / dt, dt / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, required=True)
    ap.add_argument("--opt", default="lean", choices=["lean", "fp8"])
    ap.add_argument("--remat", default="none", choices=["none", "dots", "all"])
    args = ap.parse_args()
    tag = dict(experiment="r9_big_batch", batch=args.batch, opt=args.opt,
               remat=args.remat)
    try:
        fps, ms = run(args.batch, args.opt, args.remat)
        tag.update(frames_per_s=round(fps, 1), ms_per_step=round(ms, 2))
    except Exception as e:
        tag.update(error=str(e)[-400:])
    print(json.dumps(tag), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(tag) + "\n")


if __name__ == "__main__":
    main()
