#!/usr/bin/env python3
"""Round-3 experiment: chunked loss -> batch sweep past the 2 GiB wall.

BENCH_NOTES round 2: batch 896 crashed the remote compiler on the f32
[B,224,300,3] loss tensors (2.4 GB > XLA's 2 GiB single-buffer limit);
768 was the measured best. compute_loss_chunked removes every full-res
f32 materialization, so this sweep re-probes 768 (control vs chunked)
and the previously-unreachable 896 / 1024 / 1152.

Run foreground from /root/repo (single TPU client!):
    timeout 3600 python benchmarks/r3_chunked_batch.py | tee /tmp/r3_chunked.log
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _flagship_config  # noqa: E402


def build_step(core, optimizer, chunks):
    import jax
    import jax.numpy as jnp
    import optax

    def step(params, opt_state, x_u8, rng, mu, sigma):
        def loss_fn(p):
            if chunks:
                loss_dict, x_hat = core.compute_loss_chunked(
                    p, x_u8, chunks, training=True, return_inf=True, rng=rng
                )
            else:
                x = x_u8.astype(jnp.float32) / 255.0
                loss_dict, x_hat = core.compute_loss(
                    p, x, training=True, return_inf=True, rng=rng
                )
            return loss_dict["loss"], (loss_dict, x_hat)

        grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # anomaly scoring (do_anomaly_detection.py:62-92 math). uint8 source,
        # single-consumer f32 views fuse into the reduction.
        xf = x_u8.astype(jnp.float32) / 255.0
        err = jnp.sum((xf - x_hat.astype(jnp.float32)) ** 2, axis=3)
        err_reduced = jnp.sum(err, axis=(1, 2))
        z_scores = (err_reduced - mu) / sigma
        return params, opt_state, loss_dict["loss"], z_scores

    return jax.jit(step, donate_argnums=(0, 1))


def run(batch, chunks, steps=20, warmup=4):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    core = KurtosisGlobalCVAE(
        _flagship_config(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_step(core, optimizer, chunks)

    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, 224, 300, 3), np.uint8)
    )
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)

    t_c0 = time.perf_counter()
    for i in range(warmup):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    float(loss)  # device fence (block_until_ready lies on this runtime)
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, z = step_fn(
            params, opt_state, x, rngs[warmup + i], mu, sigma
        )
    last = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(last), "non-finite loss"
    return {
        "batch": batch,
        "chunks": chunks,
        "ms_per_step": round(dt / steps * 1e3, 1),
        "frames_per_s": round(batch * steps / dt, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    combos = [(768, 8), (896, 8), (1024, 8), (768, 0), (1152, 8)]
    if len(sys.argv) > 1:
        combos = [tuple(int(v) for v in c.split(":")) for c in sys.argv[1].split(",")]
    for batch, chunks in combos:
        try:
            r = run(batch, chunks)
        except Exception as e:
            r = {"batch": batch, "chunks": chunks, "error": str(e)[:300]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
