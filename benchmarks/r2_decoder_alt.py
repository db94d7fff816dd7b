#!/usr/bin/env python3
"""Full-train-step timing with the alternate decoder formulations.

Round 1 measured the sub-pixel stride-2 upconv (_UpConv2x) and the
space-to-depth head (_RGBHead) FORWARD-only (slower / neutral). The round-2
profile (traces/train_step_b512_summary.json) shows the transposed-conv
BACKWARD pays ~10 ms/step of full-activation reverses plus channel-narrow
dW fusions — costs the plain-conv-based alternates don't have. This measures
the full fwd+bwd+Adam step both ways.
"""

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


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models import cvae as C
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean
    from benchmarks.r2_adam_batch_sweep import build_step

    batch = 512

    class AltDecoder(nn.Module):
        """Decoder with sub-pixel stride-2 upconvs + space-to-depth head —
        same parameter layouts/shapes as the ConvTranspose stack."""

        conv_filters: tuple
        dense_shape: tuple
        output_channels: int
        dtype: object = jnp.bfloat16
        param_dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, z):
            dw, dh, df = self.dense_shape
            x = nn.Dense(dw * dh * df, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=C._glorot)(z.astype(self.dtype))
            x = nn.relu(x)
            x = x.reshape((x.shape[0], dw, dh, df))
            for filters in reversed(list(self.conv_filters)):
                x = C._UpConv2x(filters, dtype=self.dtype, param_dtype=self.param_dtype)(x)
                x = nn.relu(x)
            x = C._RGBHead(self.output_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype)(x)
            return x.astype(jnp.float32)

    def run(name, use_alt):
        core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                                  param_dtype=jnp.bfloat16)
        if use_alt:
            core.decoder = AltDecoder(
                conv_filters=tuple(core.config["model"]["layers"]),
                dense_shape=C.compute_dense_shape(core.config),
                output_channels=core.config["data"]["image_size"][2],
            )
        params = core.init(jax.random.PRNGKey(0))
        optimizer = adam_lean(1e-4)
        opt_state = optimizer.init(params)
        step_fn = build_step(core, optimizer)
        x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (batch, 224, 300, 3), np.uint8))
        mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
        rngs = jax.random.split(jax.random.PRNGKey(1), 16)
        for i in range(3):
            params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
        float(loss)
        t0 = time.perf_counter()
        for i in range(12):
            params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[3 + i % 12], mu, sigma)
        final = float(loss)
        dt = time.perf_counter() - t0
        assert np.isfinite(final)
        log_result(name=name, batch=batch, frames_per_s=round(batch * 12 / dt, 1),
                   ms_per_step=round(1000 * dt / 12, 2))
        import gc

        del params, opt_state, x, step_fn
        gc.collect()

    which = set(sys.argv[1:])
    if not which or "alt" in which:
        run("altdec_b512", True)
    if not which or "plain" in which:
        run("plaindec_b512", False)
    if "fastvjp" in which:
        run_fastvjp()
    if "s2dhead" in which:
        run_fastvjp_s2dhead()




def run_fastvjp():
    """Train-step timing with the reverse-free ConvTranspose VJP decoder."""
    import gc
    import time

    import jax
    import jax.numpy as jnp

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean
    from benchmarks.r2_adam_batch_sweep import build_step

    batch = 512
    cfg = _flagship_config()
    cfg["model"]["fast_vjp"] = True
    core = KurtosisGlobalCVAE(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_step(core, optimizer)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (batch, 224, 300, 3), np.uint8))
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), 16)
    for i in range(3):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    float(loss)
    t0 = time.perf_counter()
    for i in range(12):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[3 + i % 12], mu, sigma)
    final = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    log_result(name="fastvjp_b512", batch=batch,
               frames_per_s=round(batch * 12 / dt, 1),
               ms_per_step=round(1000 * dt / 12, 2))




def run_fastvjp_s2dhead():
    """fast-vjp stride-2 upconvs + space-to-depth head: the head's plain-conv
    backward contracts 48 lanes instead of 27 (and 16x fewer positions for
    dW), attacking the 10.75+5.28 ms head grads in the b768 trace."""
    import gc
    import time

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models import cvae as C
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean
    from trustedai_cl_vae_ad_tpu.ops.convt import ConvTransposeG
    from benchmarks.r2_adam_batch_sweep import build_step

    batch = 768

    class HeadS2DDecoder(nn.Module):
        conv_filters: tuple
        dense_shape: tuple
        output_channels: int
        dtype: object = jnp.bfloat16
        param_dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, z):
            dw, dh, df = self.dense_shape
            x = nn.Dense(dw * dh * df, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=C._glorot)(z.astype(self.dtype))
            x = nn.relu(x)
            x = x.reshape((x.shape[0], dw, dh, df))
            filters = list(reversed(list(self.conv_filters)))
            for i, f in enumerate(filters):
                x = ConvTransposeG(features=f, strides=(2, 2), dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"ConvTranspose_{i}")(x)
                x = nn.relu(x)
            x = C._RGBHead(self.output_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"ConvTranspose_{len(filters)}")(x)
            return x.astype(jnp.float32)

    cfg = _flagship_config()
    core = KurtosisGlobalCVAE(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    core.decoder = HeadS2DDecoder(
        conv_filters=tuple(cfg["model"]["layers"]),
        dense_shape=C.compute_dense_shape(cfg),
        output_channels=cfg["data"]["image_size"][2],
    )
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_step(core, optimizer)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (batch, 224, 300, 3), np.uint8))
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), 16)
    for i in range(3):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    float(loss)
    t0 = time.perf_counter()
    for i in range(12):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[3 + i % 12], mu, sigma)
    final = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    log_result(name="fastvjp_s2dhead_b768", batch=batch,
               frames_per_s=round(batch * 12 / dt, 1),
               ms_per_step=round(1000 * dt / 12, 2))


if __name__ == "__main__":
    main()
