#!/usr/bin/env python3
"""Standalone Adam-update timings on the flagship 1.344B-param tree.

Isolates the optimizer from the model graph: measures ms/update for
  * optax.adam(mu_dtype=bf16)            (round-1 baseline, nu f32)
  * adam_lean(bf16, bf16)                (narrow moments, optax chain)
  * adam_lean(bf16, f32)                 (structure change only)
  * inline fused step                    (params+moments in ONE tree_map pass)

Appends to benchmarks/r2_results.jsonl.
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


def time_updates(name, make_state, step_fn, params, grads, steps=20, warmup=3):
    import jax

    state = make_state()
    for _ in range(warmup):
        params, state = step_fn(params, state, grads)
    fence = float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        params, state = step_fn(params, state, grads)
    fence = float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    dt = time.perf_counter() - t0
    log_result(name=name, ms_per_update=round(1000 * dt / steps, 2))
    del state
    gc.collect()
    return params


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    print("devices:", jax.devices(), flush=True)
    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e9:.3f}B", flush=True)
    grads = jax.tree_util.tree_map(lambda p: (p * 1e-3).astype(p.dtype), params)

    which = set(sys.argv[1:])

    def optax_step(optimizer):
        def f(params, state, grads):
            updates, state = optimizer.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        return jax.jit(f, donate_argnums=(0, 1))

    plans = {
        "upd_optax_bf16mu": lambda: optax.adam(1e-4, mu_dtype=jnp.bfloat16),
        "upd_lean_bf16_bf16": lambda: adam_lean(1e-4),
        "upd_lean_bf16_f32": lambda: adam_lean(1e-4, nu_dtype=jnp.float32),
    }
    for name, factory in plans.items():
        if which and name not in which:
            continue
        opt = factory()
        params = time_updates(name, lambda: opt.init(params), optax_step(opt), params, grads)

    if not which or "upd_inline" in which:
        # fully fused: p/mu/nu updated in one pass per leaf, all donated
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4

        def inline(params, state, grads):
            count, mu, nu = state
            count = count + 1
            cf = count.astype(jnp.float32)
            bc1 = 1.0 - jnp.float32(b1) ** cf
            bc2 = 1.0 - jnp.float32(b2) ** cf

            def one(p, g, m, v):
                g32 = g.astype(jnp.float32)
                m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
                v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
                step = lr * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
                return ((p.astype(jnp.float32) - step).astype(p.dtype),
                        m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16))

            out = jax.tree_util.tree_map(one, params, grads, mu, nu)
            new_p = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
            new_m = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
            new_v = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
            return new_p, (count, new_m, new_v)

        inline_j = jax.jit(inline, donate_argnums=(0, 1))

        def mk_state():
            z16 = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
            return (jnp.zeros([], jnp.int32),
                    jax.tree_util.tree_map(z16, params),
                    jax.tree_util.tree_map(z16, params))

        params = time_updates("upd_inline", mk_state, inline_j, params, grads)


if __name__ == "__main__":
    main()


def extra_variants():
    """upd_optax_nu16_wrap: optax.scale_by_adam's exact kernel structure with
    nu STORED bf16 via casts at the update boundary (XLA fuses the casts into
    the adjacent elementwise kernels). upd_inline_bf16: all-bf16 arithmetic."""
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(lambda p: (p * 1e-3).astype(p.dtype), params)

    inner = optax.scale_by_adam(mu_dtype=jnp.bfloat16)
    to16 = lambda t: jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), t)
    to32 = lambda t: jax.tree_util.tree_map(lambda v: v.astype(jnp.float32), t)

    def wrap_step(params, state, grads):
        state32 = state._replace(nu=to32(state.nu))
        updates, new_state = inner.update(grads, state32, params)
        updates = jax.tree_util.tree_map(lambda u: -1e-4 * u, updates)
        new_state = new_state._replace(nu=to16(new_state.nu))
        return optax.apply_updates(params, updates), new_state

    step_j = jax.jit(wrap_step, donate_argnums=(0, 1))

    def mk_state():
        s = inner.init(params)
        return s._replace(nu=to16(s.nu))

    params = time_updates("upd_optax_nu16_wrap", mk_state, step_j, params, grads)

    # all-bf16 arithmetic inline (optax-style separate passes, bf16 math)
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4

    def inline16(params, state, grads):
        count, mu, nu = state
        count = count + 1
        cf = count.astype(jnp.float32)
        bc1 = (1.0 - jnp.float32(b1) ** cf).astype(jnp.bfloat16)
        bc2 = 1.0 - jnp.float32(b2) ** cf
        t = jax.tree_util.tree_map
        mu = t(lambda m, g: jnp.bfloat16(b1) * m + jnp.bfloat16(1 - b1) * g, mu, grads)
        nu = t(lambda v, g: (b2 * v.astype(jnp.float32)
                             + (1 - b2) * (g.astype(jnp.float32) ** 2)).astype(jnp.bfloat16),
               nu, grads)
        upd = t(lambda m, v: (jnp.float32(lr) * (m.astype(jnp.float32) / bc1.astype(jnp.float32))
                              / (jnp.sqrt(v.astype(jnp.float32) / bc2) + eps)),
                mu, nu)
        params = t(lambda p, u: (p.astype(jnp.float32) - u).astype(p.dtype), params, upd)
        return params, (count, mu, nu)

    inline16_j = jax.jit(inline16, donate_argnums=(0, 1))

    def mk_state16():
        z16 = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
        return (jnp.zeros([], jnp.int32),
                jax.tree_util.tree_map(z16, params),
                jax.tree_util.tree_map(z16, params))

    time_updates("upd_inline_bf16", mk_state16, inline16_j, params, grads)


if __name__ == "__main__" and os.environ.get("R2_EXTRA"):
    extra_variants()
