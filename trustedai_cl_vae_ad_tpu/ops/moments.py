"""Fused latent-moment reductions (mean / var / skew / kurtosis).

Replaces the reference's chain of separate TF reductions
(kurtosis_global_cvae.py:57-62 and kurtosis_single_cvae.py:39-44) with a
single fused Pallas kernel on TPU: one read of the latent matrix from
VMEM produces all four moments, instead of 6+ separate HBM-bound reduction
ops. A pure-jnp implementation provides the fallback path (CPU tests,
oversized inputs) and the numerical reference the kernel is validated
against (tests/test_moments.py, tolerance 1e-6).

Semantics match TF exactly:
  * population variance (ddof=0),
  * z_score = divide_no_nan(z - mean, std): skew/kurt are 0 where std == 0,
  * skew = E[z_score^3], kurtosis = E[z_score^4].

The backward pass is an analytic custom VJP (elementwise + one reduction,
fully fused by XLA), avoiding the memory-bound autodiff replay of the
two-pass forward.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Arrays above this many bytes skip the single-block kernel and use jnp
# (XLA handles the tiled reduction); typical latents (256 x 2000 f32 = 2 MB)
# fit VMEM comfortably.
_VMEM_BYTES_LIMIT = 8 * 1024 * 1024

_INTERPRET = False  # flipped by tests on CPU


def _safe_div(num, den):
    den_safe = jnp.where(den == 0, 1.0, den)
    return jnp.where(den == 0, jnp.zeros_like(num), num / den_safe)


# ---------------------------------------------------------------------------
# jnp reference implementations
# ---------------------------------------------------------------------------

def _global_moments_jnp(z: Array) -> Tuple[Array, Array, Array, Array]:
    z = z.astype(jnp.float32)
    m = jnp.mean(z)
    zc = z - m
    var = jnp.mean(zc * zc)
    std = jnp.sqrt(var)
    zs = _safe_div(zc, std)
    skew = jnp.mean(zs**3)
    kurt = jnp.mean(zs**4)
    return m, var, skew, kurt


def _perdim_moments_jnp(z: Array) -> Tuple[Array, Array, Array, Array]:
    z = z.astype(jnp.float32)
    m = jnp.mean(z, axis=0)
    zc = z - m[None, :]
    var = jnp.mean(zc * zc, axis=0)
    std = jnp.sqrt(var)
    zs = _safe_div(zc, std[None, :])
    skew = jnp.mean(zs**3, axis=0)
    kurt = jnp.mean(zs**4, axis=0)
    return m, var, skew, kurt


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _global_kernel(z_ref, out_ref):
    data = z_ref[:].astype(jnp.float32)
    n = jnp.float32(data.size)
    m = jnp.sum(data) / n
    zc = data - m
    zc2 = zc * zc
    s2 = jnp.sum(zc2)
    s3 = jnp.sum(zc2 * zc)
    s4 = jnp.sum(zc2 * zc2)
    var = s2 / n
    std = jnp.sqrt(var)
    std3 = std * var
    var2 = var * var
    skew = jnp.where(std == 0, 0.0, (s3 / n) / jnp.where(std3 == 0, 1.0, std3))
    kurt = jnp.where(var == 0, 0.0, (s4 / n) / jnp.where(var2 == 0, 1.0, var2))
    out_ref[0] = m
    out_ref[1] = var
    out_ref[2] = skew
    out_ref[3] = kurt


def _perdim_kernel(z_ref, out_ref):
    data = z_ref[:].astype(jnp.float32)
    n = jnp.float32(data.shape[0])
    m = jnp.sum(data, axis=0, keepdims=True) / n
    zc = data - m
    zc2 = zc * zc
    s2 = jnp.sum(zc2, axis=0, keepdims=True)
    s3 = jnp.sum(zc2 * zc, axis=0, keepdims=True)
    s4 = jnp.sum(zc2 * zc2, axis=0, keepdims=True)
    var = s2 / n
    std = jnp.sqrt(var)
    std3 = std * var
    var2 = var * var
    skew = jnp.where(std == 0, 0.0, (s3 / n) / jnp.where(std3 == 0, 1.0, std3))
    kurt = jnp.where(var == 0, 0.0, (s4 / n) / jnp.where(var2 == 0, 1.0, var2))
    out_ref[0, :] = m[0, :]
    out_ref[1, :] = var[0, :]
    out_ref[2, :] = skew[0, :]
    out_ref[3, :] = kurt[0, :]


def _global_moments_pallas(z: Array) -> Tuple[Array, Array, Array, Array]:
    out = pl.pallas_call(
        _global_kernel,
        out_shape=jax.ShapeDtypeStruct((4,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_INTERPRET,
    )(z)
    return out[0], out[1], out[2], out[3]


def _perdim_moments_pallas(z: Array) -> Tuple[Array, Array, Array, Array]:
    latent = z.shape[1]
    out = pl.pallas_call(
        _perdim_kernel,
        out_shape=jax.ShapeDtypeStruct((4, latent), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(z)
    return out[0], out[1], out[2], out[3]


def _use_pallas(z: Array) -> bool:
    if _INTERPRET:
        return True
    if jax.default_backend() != "tpu":
        return False
    return z.size * 4 <= _VMEM_BYTES_LIMIT


# ---------------------------------------------------------------------------
# Custom VJP wrappers
#
# Analytic gradients (N = reduction count, zc = z - m, m2c/m3c/m4c = centered
# moments, all with divide_no_nan semantics -> zero grads where var == 0):
#   d mean / dz_i = 1/N
#   d var  / dz_i = 2 zc_i / N
#   d skew / dz_i = (3/N) var^{-3/2} (zc_i^2 - m2c - m3c zc_i / var)
#   d kurt / dz_i = (4/N) var^{-2}   (zc_i^3 - m3c - m4c zc_i / var)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def global_moments(z: Array) -> Tuple[Array, Array, Array, Array]:
    """Global (flattened) moments of z: (mean, var, skew, kurtosis) scalars."""
    if _use_pallas(z):
        return _global_moments_pallas(z)
    return _global_moments_jnp(z)


def _global_fwd(z):
    out = global_moments(z)
    return out, (z, out)


def _global_bwd(res, g):
    z, (m, var, skew, kurt) = res
    gm, gv, gs, gk = g
    n = jnp.float32(z.size)
    zc = z.astype(jnp.float32) - m
    std = jnp.sqrt(var)
    m2c = var
    m3c = skew * std * var  # m3c = skew * std^3
    m4c = kurt * var * var
    inv_var = _safe_div(jnp.float32(1.0), var)
    inv_std3 = _safe_div(jnp.float32(1.0), std * var)
    inv_var2 = inv_var * inv_var
    d_mean = jnp.full_like(zc, 1.0 / n)
    d_var = 2.0 * zc / n
    d_skew = (3.0 / n) * inv_std3 * (zc * zc - m2c - m3c * zc * inv_var)
    d_kurt = (4.0 / n) * inv_var2 * (zc * zc * zc - m3c - m4c * zc * inv_var)
    grad = gm * d_mean + gv * d_var + gs * d_skew + gk * d_kurt
    return (grad.astype(z.dtype),)


global_moments.defvjp(_global_fwd, _global_bwd)


@jax.custom_vjp
def perdim_moments(z: Array) -> Tuple[Array, Array, Array, Array]:
    """Per-latent-dim moments over axis 0: (mean, var, skew, kurt), each (L,)."""
    if _use_pallas(z):
        return _perdim_moments_pallas(z)
    return _perdim_moments_jnp(z)


def _perdim_fwd(z):
    out = perdim_moments(z)
    return out, (z, out)


def _perdim_bwd(res, g):
    z, (m, var, skew, kurt) = res
    gm, gv, gs, gk = g
    n = jnp.float32(z.shape[0])
    zc = z.astype(jnp.float32) - m[None, :]
    std = jnp.sqrt(var)
    m2c = var
    m3c = skew * std * var
    m4c = kurt * var * var
    inv_var = _safe_div(jnp.ones_like(var), var)
    inv_std3 = _safe_div(jnp.ones_like(var), std * var)
    inv_var2 = inv_var * inv_var
    d_mean = jnp.broadcast_to(gm[None, :] / n, zc.shape)
    d_var = gv[None, :] * 2.0 * zc / n
    d_skew = gs[None, :] * (3.0 / n) * inv_std3[None, :] * (
        zc * zc - m2c[None, :] - m3c[None, :] * zc * inv_var[None, :]
    )
    d_kurt = gk[None, :] * (4.0 / n) * inv_var2[None, :] * (
        zc * zc * zc - m3c[None, :] - m4c[None, :] * zc * inv_var[None, :]
    )
    grad = d_mean + d_var + d_skew + d_kurt
    return (grad.astype(z.dtype),)


perdim_moments.defvjp(_perdim_fwd, _perdim_bwd)


# ---------------------------------------------------------------------------
# Weighted (masked) variants
#
# Used by the continual-learning step to pad the replay buffer to a FIXED
# capacity without retracing per replay size (stream/engine.py): padded rows
# carry weight 0 and drop out of every statistic exactly. With all-ones
# weights these reduce to the unweighted formulas. Pure jnp (autodiff
# handles the backward); CL batches are small, so no kernel needed.
# ---------------------------------------------------------------------------

def global_moments_weighted(z: Array, w: Array) -> Tuple[Array, Array, Array, Array]:
    """Global moments of z's rows weighted by w (B,): (mean, var, skew, kurt)."""
    z = z.astype(jnp.float32)
    w = w.astype(jnp.float32)[:, None]
    n = jnp.sum(w) * z.shape[1]
    m = jnp.sum(w * z) / n
    zc = z - m
    var = jnp.sum(w * zc * zc) / n
    std = jnp.sqrt(var)
    zs = _safe_div(zc, std)
    zs2 = zs * zs
    skew = jnp.sum(w * zs2 * zs) / n
    kurt = jnp.sum(w * zs2 * zs2) / n
    return m, var, skew, kurt


def perdim_moments_weighted(z: Array, w: Array) -> Tuple[Array, Array, Array, Array]:
    """Per-dim moments over axis 0 with row weights w (B,): each (L,)."""
    z = z.astype(jnp.float32)
    w = w.astype(jnp.float32)[:, None]
    n = jnp.sum(w)
    m = jnp.sum(w * z, axis=0) / n
    zc = z - m[None, :]
    var = jnp.sum(w * zc * zc, axis=0) / n
    std = jnp.sqrt(var)
    zs = _safe_div(zc, std[None, :])
    zs2 = zs * zs
    skew = jnp.sum(w * zs2 * zs, axis=0) / n
    kurt = jnp.sum(w * zs2 * zs2, axis=0) / n
    return m, var, skew, kurt


# Expose the jnp reference for validation tests.
global_moments_reference = _global_moments_jnp
perdim_moments_reference = _perdim_moments_jnp
