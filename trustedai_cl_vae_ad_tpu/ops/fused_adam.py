"""Fused Adam update as a Pallas kernel with bf16 moment storage.

For the 1.34B-parameter flagship the Adam update is HBM-bandwidth bound
(~24 GB/step with optax's f32 second moment ~= 20 ms on v5e). This kernel
stores BOTH moments in bf16 (f32 math in-register) and writes p/m/v in one
pass with input/output aliasing: 8 bytes read + 6 written per param
(~19 GB -> ~14 GB traffic) and 2.7 GB less resident state, which buys a
larger batch.

API is a direct step (``init_state`` + ``apply``) rather than an optax
GradientTransformation: optax's update/apply_updates contract would force an
extra delta pass over all parameters, forfeiting the fused win. jnp fallback
(identical math) runs off-TPU and for small leaves.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024
_BLOCK_ROWS = 256
_PALLAS_MIN_ELEMS = 1 << 20

_INTERPRET = False


class AdamBF16State(NamedTuple):
    mu: dict
    nu: dict
    count: jax.Array


def init_state(params) -> AdamBF16State:
    zeros = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
    return AdamBF16State(
        mu=jax.tree_util.tree_map(zeros, params),
        nu=jax.tree_util.tree_map(zeros, params),
        count=jnp.zeros([], jnp.int32),
    )


def _adam_math(p, g, m, v, lr, c1, c2, b1, b2, eps):
    g32 = g.astype(jnp.float32)
    m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
    new_p = p.astype(jnp.float32) - lr * (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
    return new_p.astype(p.dtype), m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)


def _make_kernel(b1: float, b2: float, eps: float):
    def kernel(lr_ref, c1_ref, c2_ref, p_ref, g_ref, m_ref, v_ref,
               po_ref, mo_ref, vo_ref):
        new_p, new_m, new_v = _adam_math(
            p_ref[:], g_ref[:], m_ref[:], v_ref[:],
            lr_ref[0], c1_ref[0], c2_ref[0], b1, b2, eps,
        )
        po_ref[:] = new_p
        mo_ref[:] = new_m
        vo_ref[:] = new_v

    return kernel


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "eps", "interpret"), donate_argnums=(0, 2, 3)
)
def _pallas_leaf_update(p, g, m, v, lr, c1, c2, b1=0.9, b2=0.999, eps=1e-8,
                        interpret=False):
    """One 2-D leaf, updated in its NATIVE shape with a 2-D grid.

    Reshaping to a canonical (n/1024, 1024) view is NOT free on TPU: the
    (8, 128)-tiled layout makes any reshape across the lane dim a physical
    re-tile — measured 3x slower end-to-end from 7 re-tiles of a 2.15 GB
    leaf. Blocks adapt to the leaf's width; Mosaic masks partial edge blocks.
    """
    rows, cols = p.shape
    bc = min(cols, 8192)
    # ~4 MB of VMEM across the 7 live buffers (4 in + 3 out, bf16)
    br = max(8, min(rows, (4 * 1024 * 1024) // (bc * 2 * 7) // 8 * 8 or 8))
    grid = (pl.cdiv(rows, br), pl.cdiv(cols, bc))
    blk = pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    po, mo, vo = pl.pallas_call(
        _make_kernel(b1, b2, eps),
        grid=grid,
        in_specs=[smem, smem, smem, blk, blk, blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(p.shape, jnp.bfloat16),
            jax.ShapeDtypeStruct(p.shape, jnp.bfloat16),
        ),
        input_output_aliases={3: 0, 5: 1, 6: 2},  # p->p', m->m', v->v'
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.reshape(lr.astype(jnp.float32), (1,)),
        jnp.reshape(c1, (1,)),
        jnp.reshape(c2, (1,)),
        p, g, m, v,
    )
    return po, mo, vo


def apply(params, grads, state: AdamBF16State, learning_rate,
          b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One fused Adam step: (params, grads, state, lr) -> (new_params, state)."""
    count = state.count + 1
    tf32 = count.astype(jnp.float32)
    c1 = 1.0 - b1**tf32
    c2 = 1.0 - b2**tf32
    lr = jnp.asarray(learning_rate, jnp.float32)
    use_pallas = _INTERPRET or jax.default_backend() == "tpu"

    def leaf(p, g, m, v):
        if use_pallas and p.ndim == 2 and p.size >= _PALLAS_MIN_ELEMS:
            # interpret is part of the jit cache key (static arg): toggling the
            # module flag cannot leave stale compiled/interpret kernels behind
            return _pallas_leaf_update(p, g, m, v, lr, c1, c2, b1=b1, b2=b2, eps=eps,
                                       interpret=_INTERPRET)
        return _adam_math(p, g, m, v, lr, c1, c2, b1, b2, eps)

    out = jax.tree_util.tree_map(leaf, params, grads, state.mu, state.nu)
    isleaf = lambda o: isinstance(o, tuple)
    new_params = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=isleaf)
    new_mu = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=isleaf)
    new_nu = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=isleaf)
    return new_params, AdamBF16State(mu=new_mu, nu=new_nu, count=count)


def apply_reference(params, grads, state, learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    """Pure-jnp path (identical math), for validating the kernel."""
    count = state.count + 1
    tf32 = count.astype(jnp.float32)
    c1 = 1.0 - b1**tf32
    c2 = 1.0 - b2**tf32
    lr = jnp.asarray(learning_rate, jnp.float32)
    out = jax.tree_util.tree_map(
        lambda p, g, m, v: _adam_math(p, g, m, v, lr, c1, c2, b1, b2, eps),
        params, grads, state.mu, state.nu,
    )
    isleaf = lambda o: isinstance(o, tuple)
    return (
        jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=isleaf),
        AdamBF16State(
            mu=jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=isleaf),
            nu=jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=isleaf),
            count=count,
        ),
    )
