"""ARCHIVED dead-end kernel (r11): fused dense-gradient + Adam update.

Deleted from the package (BENCH_NOTES.md r11): Pallas input_output_aliases
fails on the flagship's lane-misaligned N=4000 state shapes (Mosaic inserts
full w/mu/nu copies), and in the real step XLA already output-fuses the dW
dot into the Adam chain (add_convert_fusion, 20.3 ms) — beating this
kernel's best aligned case (22.4 ms). Kept here so the r11 harnesses stay
runnable; not part of the product surface. Original rationale below.

Fused dense-kernel gradient + Adam update (Pallas, TPU).

The flagship step's single biggest cost is updating the two giant dense
kernels (encoder Dense 268800x4000 = 1.075B params, decoder Dense
2000x134400 = 268.8M): XLA materializes dW = x^T @ dz to HBM (2.15 GB bf16
for the encoder) and then re-reads it in the Adam fusion, so the update chain
moves ~19.5 GB/step at batch 768 (measured 20.3 ms Adam fusion + 8.8 ms dW
matmul, traces/train_step_b768_vmem96m_roofline.json). This kernel computes
dW tile-by-tile ON THE MXU and applies the Adam update in the epilogue while
the tile is still in VMEM: the gradient never touches HBM, cutting the
encoder-kernel update to its ~13.3 GB param/moment-traffic floor.

This is NOT the round-1 ``ops/fused_adam.py`` (elementwise-only Adam kernel,
deleted — XLA already fuses the elementwise chain, BENCH_NOTES r1). The win
here is fusing the GRADIENT MATMUL into the update, which XLA will not do
(the Adam fusion has 3 extra 2.15 GB operands).

Semantics: one optax-style Adam step on a single dense kernel, matching
``ops/adam.py`` adam_lean numerics — f32 EMA arithmetic, narrow (bf16)
moment storage, gradient quantized to the param dtype first (autodiff's
cotangent for a bf16 param is bf16):

    g    = cast_to(w.dtype, x^T @ dz)            # f32 MXU accumulation
    mu'  = b1*mu + (1-b1)*g                      # f32
    nu'  = b2*nu + (1-b2)*g^2                    # f32
    w'   = w - lr * (mu'/bc1) / (sqrt(nu'/bc2) + eps)
    bc_i = 1 - b_i^count                         # count = post-step number

Reference hot loop being optimized: /root/reference/src/abstract_cvae.py
:154-162 (GradientTape step + optimizer.apply_gradients).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INTERPRET = False  # flipped by CPU tests (like ops/moments.py)

# Per-block byte budgets (the Mosaic pipeline double-buffers each blocked
# operand, and w/mu/nu appear as both input and output blocks).
_BLOCK_BYTES = 2 * 1024 * 1024
_RESIDENT_BYTES = 12 * 1024 * 1024  # whole-array VMEM residency cutoff


def _pick_block(dim: int, align: int, cap_elems: int) -> int:
    """Largest divisor of ``dim`` that is a multiple of ``align`` and at most
    ``cap_elems``; falls back to ``dim`` when none exists (caller bounds it)."""
    best = 0
    for d in range(align, min(dim, cap_elems) + 1, align):
        if dim % d == 0:
            best = d
    return best if best else dim


def adam_epilogue(g32, w, mu, nu, lr, b1, b2, eps, bc1, bc2):
    """The shared f32 Adam math (kernel body and jnp reference)."""
    g = g32.astype(w.dtype).astype(jnp.float32)  # autodiff-cotangent quantization
    mu_n = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g
    nu_n = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (g * g)
    m_hat = mu_n / bc1
    v_hat = nu_n / bc2
    upd = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    w_n = (w.astype(jnp.float32) - upd).astype(w.dtype)
    return w_n, mu_n.astype(mu.dtype), nu_n.astype(nu.dtype)


def _kernel(s_ref, x_ref, dz_ref, w_ref, mu_ref, nu_ref,
            w_out, mu_out, nu_out):
    lr, b1, b2, eps, bc1, bc2 = (s_ref[i, 0] for i in range(6))
    g32 = jax.lax.dot_general(
        x_ref[:], dz_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract K: x^T @ dz
        preferred_element_type=jnp.float32,
    )
    w_n, mu_n, nu_n = adam_epilogue(
        g32, w_ref[:], mu_ref[:], nu_ref[:], lr, b1, b2, eps, bc1, bc2
    )
    w_out[:] = w_n
    mu_out[:] = mu_n
    nu_out[:] = nu_n


def fused_dense_grad_adam_reference(x, dz, w, mu, nu, *, lr, b1, b2, eps, count):
    """Pure-jnp transcription (CPU fallback + the kernel's numerical oracle)."""
    cnt = jnp.asarray(count, jnp.float32)
    bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** cnt
    bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** cnt
    g32 = jax.lax.dot_general(
        x, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return adam_epilogue(
        g32, w, mu, nu,
        jnp.asarray(lr, jnp.float32), jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32), jnp.asarray(eps, jnp.float32), bc1, bc2,
    )


def fused_dense_grad_adam(
    x: Array, dz: Array, w: Array, mu: Array, nu: Array,
    *, lr, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, count,
) -> Tuple[Array, Array, Array]:
    """One Adam step on dense kernel ``w`` [M, N] from activations ``x``
    [K, M] and output cotangents ``dz`` [K, N]; dW = x^T @ dz is never
    materialized. ``count`` is the POST-step count (optax's count + 1).

    Returns (w', mu', nu'). On non-TPU backends (or shapes the tiler can't
    block) this falls back to the jnp reference, which XLA lowers to the
    standard dot + update chain.
    """
    K, M = x.shape
    K2, N = dz.shape
    assert K == K2 and w.shape == (M, N) and mu.shape == (M, N) and nu.shape == (M, N)

    platform = jax.devices()[0].platform
    if platform != "tpu" and not _INTERPRET:
        return fused_dense_grad_adam_reference(
            x, dz, w, mu, nu, lr=lr, b1=b1, b2=b2, eps=eps, count=count)

    itm = jnp.dtype(w.dtype).itemsize
    dz_resident = K * N * dz.dtype.itemsize <= _RESIDENT_BYTES
    x_resident = (not dz_resident) and K * M * x.dtype.itemsize <= _RESIDENT_BYTES

    # Mosaic requires a block's lane (last) dim to be a multiple of 128 or the
    # whole array dim, and its sublane dim a multiple of 8/16 — x's block last
    # dim is bm and dz's is bn, so both tile sizes are 128-aligned (a full-dim
    # block sidesteps the constraint, used for the resident operand).
    if dz_resident:
        # 1-D grid over M: dz + the scalars stay resident; x/w/mu/nu stream.
        bn = N
        bm = _pick_block(M, 128, max(128, _BLOCK_BYTES // (bn * itm)))
        grid = (M // bm,)
        x_spec = pl.BlockSpec((K, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
        dz_spec = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
        state_idx = lambda i: (i, 0)
    elif x_resident:
        # 1-D grid over N: x (whole, sidestepping M's alignment) stays
        # resident; dz/w/mu/nu stream exactly once.
        bm = M
        bn = _pick_block(N, 128, max(128, _BLOCK_BYTES // (bm * itm)))
        grid = (N // bn,)
        x_spec = pl.BlockSpec((K, M), lambda i: (0, 0), memory_space=pltpu.VMEM)
        dz_spec = pl.BlockSpec((K, bn), lambda i: (0, i), memory_space=pltpu.VMEM)
        state_idx = lambda i: (0, i)
    else:
        # Both operands big: 2-D grid, m innermost so dz re-fetches only once
        # per n block and x once per (n, m).
        bn = _pick_block(N, 128, max(128, _BLOCK_BYTES // (K * dz.dtype.itemsize)))
        bm = _pick_block(M, 128, max(128, _BLOCK_BYTES // (bn * itm)))
        grid = (N // bn, M // bm)
        x_spec = pl.BlockSpec((K, bm), lambda n, m: (0, m), memory_space=pltpu.VMEM)
        dz_spec = pl.BlockSpec((K, bn), lambda n, m: (0, n), memory_space=pltpu.VMEM)
        state_idx = lambda n, m: (m, n)

    blk_bytes = max(bm * bn * itm, K * bm * x.dtype.itemsize,
                    K * bn * dz.dtype.itemsize)
    if M % bm or N % bn or blk_bytes > 8 * _BLOCK_BYTES:
        # shape the tiler can't block evenly/affordably (e.g. no 128-multiple
        # divisor): XLA's dot + update chain handles it
        return fused_dense_grad_adam_reference(
            x, dz, w, mu, nu, lr=lr, b1=b1, b2=b2, eps=eps, count=count)

    cnt = jnp.asarray(count, jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        jnp.asarray(eps, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** cnt,
        1.0 - jnp.asarray(b2, jnp.float32) ** cnt,
    ]).reshape(6, 1)

    state_spec = pl.BlockSpec((bm, bn), state_idx, memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(w.shape, w.dtype),
                 jax.ShapeDtypeStruct(mu.shape, mu.dtype),
                 jax.ShapeDtypeStruct(nu.shape, nu.dtype)]
    # VMEM budget: double-buffered blocked operands (w/mu/nu in+out, x, dz)
    # + the kernel body's f32 intermediates (g32, EMA temps: ~4 tiles live).
    # The runtime's default scoped limit (16 MB) rejects these block sizes.
    blk = bm * bn
    vmem = 2 * (6 * blk * itm + K * bm * x.dtype.itemsize
                + min(K * N, K * bn) * dz.dtype.itemsize) + 4 * blk * 4
    if dz_resident:
        vmem += K * N * dz.dtype.itemsize
    vmem_limit = min(int(vmem * 1.25), 100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=2 * M * N * K,
        bytes_accessed=(M * N * itm * 6 + K * M * x.dtype.itemsize
                        + K * N * dz.dtype.itemsize),
        transcendentals=0,
    )
    return tuple(pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, 1), (lambda *_: (0, 0)), memory_space=pltpu.SMEM),
            x_spec, dz_spec, state_spec, state_spec, state_spec,
        ],
        out_specs=[state_spec, state_spec, state_spec],
        out_shape=out_shape,
        input_output_aliases={3: 0, 4: 1, 5: 2},  # w, mu, nu update in place
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=_INTERPRET,
    )(scalars, x, dz, w, mu, nu))
