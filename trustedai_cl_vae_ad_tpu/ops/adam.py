"""Adam with configurable moment dtypes (optax-compatible).

Motivation (BENCH_NOTES round 1): the flagship model is 1.344B params; with
optax's f32 second moment the optimizer state is 8.1 GB and batch 512 OOMs a
16 GB v5e. Storing BOTH moments in bfloat16 halves that to 5.4 GB, unlocking
batch 512-1024 where the ~20 ms Adam update amortizes toward zero per frame
(reference hot loop: abstract_cvae.py:154-162 + train.py:99-101).

Numerics: the SECOND moment's EMA runs in f32 (nu is upcast, updated, then
stored back in ``nu_dtype``) because that is where narrow arithmetic breaks;
mu keeps optax's native behavior (with bf16 cotangents its EMA runs in bf16
arithmetic — harmless: b1=0.9 makes the per-step increment ~10% of the
moment, far above bf16's ~0.2% relative resolution).
With b2=0.999 the per-step relative increment to nu (~1e-3) sits below
bf16's relative resolution (~2e-3), so round-to-nearest can freeze nu near
steady state; ``stochastic_round_nu=True`` dithers the cast with random
low-order bits, making the EMA unbiased at the cost of one cheap RNG stream
per step. Round-to-nearest is the default: the step direction is unaffected
and sqrt halves the magnitude error (~0.2% step-size jitter).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamLeanState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    rng: Optional[jax.Array]


def _stochastic_round_bf16(x32: jax.Array, key: jax.Array) -> jax.Array:
    """f32 -> bf16 with stochastic rounding: add uniform bits below the
    bf16 mantissa boundary, then truncate (take the high 16 bits)."""
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    noise = jax.random.bits(key, bits.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    dithered = bits + noise
    hi = (dithered >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def scale_by_adam_lean(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
    nu_dtype=jnp.bfloat16,
    stochastic_round_nu: bool = False,
) -> optax.GradientTransformation:
    """optax transformation: Adam moments stored in the given dtypes.

    Implemented as optax.scale_by_adam with nu cast narrow/wide at the update
    boundary: XLA fuses both casts into the adjacent elementwise kernels, so
    the measured wall time equals stock optax (~29.5 ms on the 1.344B
    flagship, v5e) while nu's HBM residency halves — the round-1 handrolled
    tree_map variants lowered to ~45% of the HBM roofline (43 ms), so keeping
    optax's exact kernel structure matters (benchmarks/r2_results.jsonl).
    """
    inner = optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)

    def _narrow(nu, key):
        if nu_dtype == jnp.float32:
            return nu
        if stochastic_round_nu and nu_dtype == jnp.bfloat16:
            leaves, treedef = jax.tree_util.tree_flatten(nu)
            keys = jax.tree_util.tree_unflatten(
                treedef, list(jax.random.split(key, len(leaves)))
            )
            return jax.tree_util.tree_map(_stochastic_round_bf16, nu, keys)
        return jax.tree_util.tree_map(lambda v: v.astype(nu_dtype), nu)

    def _widen(nu):
        if nu_dtype == jnp.float32:
            return nu
        return jax.tree_util.tree_map(lambda v: v.astype(jnp.float32), nu)

    def init_fn(params):
        s = inner.init(params)
        rng = jax.random.PRNGKey(0) if stochastic_round_nu else None
        # note: optax inits moments as zeros_like(params) — with bf16 params
        # nu starts bf16; plain astype (zeros are exact in any dtype)
        nu0 = jax.tree_util.tree_map(lambda v: v.astype(nu_dtype), s.nu)
        return ScaleByAdamLeanState(count=s.count, mu=s.mu, nu=nu0, rng=rng)

    def update_fn(updates, state, params=None):
        if stochastic_round_nu:
            rng, sub = jax.random.split(state.rng)
        else:
            rng, sub = state.rng, None
        # widen nu to f32 so the EMA accumulates in f32 — stock optax with
        # bf16 params runs the b2=0.999 EMA in bf16 arithmetic, where the
        # ~1e-3 relative increments round away entirely (nu freezes)
        inner_state = optax.ScaleByAdamState(
            count=state.count, mu=state.mu, nu=_widen(state.nu)
        )
        new_updates, new_inner = inner.update(updates, inner_state, params)
        return new_updates, ScaleByAdamLeanState(
            count=new_inner.count, mu=new_inner.mu,
            nu=_narrow(new_inner.nu, sub), rng=rng,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam_lean(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
    nu_dtype=jnp.bfloat16,
    stochastic_round_nu: bool = False,
) -> optax.GradientTransformation:
    """Adam with narrow moment storage; drop-in for optax.adam."""
    return optax.chain(
        scale_by_adam_lean(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype,
            stochastic_round_nu=stochastic_round_nu,
        ),
        optax.scale(-learning_rate),
    )
