"""Adam with 8-bit (float8_e4m3) moment storage — experimental (r9).

Motivation: the flagship's Adam update is pure HBM bandwidth (~33 ms/step on
1.344B params at b768, 73-86% of roofline — BENCH_NOTES r2). Moments are
already bf16 (ops/adam.py adam_lean); storing them as float8_e4m3 halves the
moment bytes again (saving ~5.4 GB of the ~18.8 GB update traffic) and frees
2.69 GB of HBM — potentially unlocking batch 896+, whose blocker is memory
(BENCH_NOTES r3). Published precedent for 8-bit Adam moments at scale:
blockwise-quantized 8-bit optimizers (Dettmers et al., bitsandbytes).

Design constraints (all measured in earlier rounds):
- **No reshapes of big leaves**: any reshape across the lane dim is a
  physical (8,128) re-tile (BENCH_NOTES r1). Scales are therefore per-ROW
  of each 2-D kernel (reduce over the existing last dim), not per-128-block.
- **Single HBM pass**: quantizing with a scale computed from the NEW moment
  forces a reduce-then-requantize double pass that eats the byte savings.
  We quantize with the PREVIOUS step's scale (absmax/256 of 448 — 1.75x
  headroom; e4m3 saturation clips outliers for one step) and emit the fresh
  scale as a fused side-output for the next step. Step 0 quantizes with the
  init scale (1.0), so the EMA effectively starts one step late — a lax.cond
  double-pass special-casing step 0 was measured to materialize both f32
  moment intermediates as cond operands (2 x 5.4 GB on the flagship -> OOM,
  r9); the step-0 PARAM update itself still uses the exact f32 values.
- **EMA arithmetic in f32** (adam_lean's fix): storage is narrow, math is
  not. e4m3's ~6% relative resolution makes the b2=0.999 EMA's ~1e-3
  increments round away under round-to-nearest (the bf16 freeze, 30x
  worse), so stochastic rounding is the expected-correct mode. Threefry SR
  measured +30 ms/tree (BENCH_NOTES r2); here the dither bits come from a
  fused counter-based murmur3-style hash (~10 VPU ops/element, no HBM
  traffic, no RNG state) — free while the chain is bandwidth-bound.

Small leaves (< 2^20 elements or 1-D) stay in bf16: their bytes are
negligible and per-row scales are meaningless for biases.

This module is promoted from benchmarks/ only if the microbenchmark
(benchmarks/r9_adam8.py) and the convergence tests (tests/test_adam8.py)
both hold; see BENCH_NOTES r9 for the measurements.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import optax

FP8 = jnp.float8_e4m3fn
FP8_MAX = 448.0
HEADROOM_TARGET = 256.0  # quantize so the current absmax lands here (of 448)
BIG_LEAF_ELEMS = 1 << 20


class QLeaf(NamedTuple):
    """One quantized moment leaf: fp8 payload + two per-row f32 scales.

    ``q`` holds float8_e4m3fn BITPATTERNS in an int8 array: the bitcast
    view is free and int8 is the safer dtype for checkpoint serialization
    (orbax/np round-trip fp8 poorly). (An earlier r9 bisect blamed fp8
    donation for the TPU INVALID_ARGUMENT failures; the real cause was
    init aliasing scale/scale_next to ONE buffer — double donation — see
    init_fn and BENCH_NOTES r9b.) ``scale`` is the scale ``q`` was quantized
    WITH (dequant = bitcast(q) * scale); ``scale_next`` is the fresh
    absmax/HEADROOM of the unquantized value, used to quantize NEXT step.
    Keeping both is what makes the update a single HBM pass: quantization
    never waits on this step's reduction."""

    q: jax.Array          # int8 view of float8_e4m3fn, param leaf's shape
    scale: jax.Array      # f32, shape leaf.shape[:-1] + (1,)
    scale_next: jax.Array  # f32, same shape as scale


class AdamFp8State(NamedTuple):
    count: jax.Array
    mu: List[Union[jax.Array, QLeaf]]
    nu: List[Union[jax.Array, QLeaf]]


def _is_big(x) -> bool:
    return x.ndim >= 2 and x.size >= BIG_LEAF_ELEMS


def _hash_bits(shape: Tuple[int, ...], salt: jax.Array) -> jax.Array:
    """Fused counter-based uint32 dither bits: murmur3 finalizer over a
    per-element index mixed with ``salt`` (step count + leaf id). ~10 VPU
    ops/element, no state, no HBM traffic — unlike threefry (+30 ms/tree,
    BENCH_NOTES r2). Quality is dither-grade, not crypto-grade: exactly what
    stochastic rounding needs."""
    h = jnp.zeros(shape, jnp.uint32)
    for d, n in enumerate(shape):
        if n > 1:
            i = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
            h = h ^ (i * jnp.uint32((0x9E3779B1 + 0x85EBCA77 * d) & 0xFFFFFFFF))
    h = h + salt.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _sr_cast(x32: jax.Array, dtype, noise: jax.Array) -> jax.Array:
    """f32 -> narrow float with stochastic rounding: dither the mantissa
    bits below the target's mantissa boundary, truncate, then convert (the
    truncated value is exactly representable for in-range normals; subnormal
    targets see slightly coarser dither, which only weakens — never breaks —
    the unbiasedness)."""
    # bits of f32 mantissa below the target's mantissa width (bf16 is the
    # f32 high half; e4m3 keeps 3 mantissa bits; f16 keeps 10 — truncated
    # in-range normals are exactly representable in each)
    drop = {jnp.bfloat16: 16, FP8: 20, jnp.float16: 13}[dtype]
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    mask = jnp.uint32((1 << drop) - 1)
    dithered = bits + (noise & mask)
    truncated = jax.lax.bitcast_convert_type(dithered & ~mask, jnp.float32)
    if dtype == FP8:
        # the dither can push a near-max value past 448, which e4m3fn (no
        # inf) converts to NaN — clamp in f32 where 448 is exact
        truncated = jnp.clip(truncated, -FP8_MAX, FP8_MAX)
    return truncated.astype(dtype)


def _rowabsmax(x32: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(x32), axis=-1, keepdims=True)


def _quantize(x32: jax.Array, scale: jax.Array, sr: bool, noise) -> jax.Array:
    y = x32 / scale
    y = jnp.clip(y, -FP8_MAX, FP8_MAX)  # e4m3fn has no inf: saturate, don't NaN
    q = _sr_cast(y, FP8, noise) if sr else y.astype(FP8)
    return jax.lax.bitcast_convert_type(q, jnp.int8)


def dequant(leaf: Union[jax.Array, QLeaf]) -> jax.Array:
    """f32 view of a moment leaf (handles both bf16 and quantized leaves)."""
    if isinstance(leaf, QLeaf):
        q = jax.lax.bitcast_convert_type(leaf.q, FP8)
        return q.astype(jnp.float32) * leaf.scale
    return leaf.astype(jnp.float32)


_dequant = dequant


def scale_by_adam_fp8(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=FP8,
    nu_dtype=FP8,
    stochastic_round: str = "both",  # "none" | "nu" | "both"
) -> optax.GradientTransformation:
    """optax transformation: Adam with fp8 (or bf16) moment storage.

    Moments are kept as flat leaf lists (not a params-shaped tree) because a
    quantized leaf is itself a (q, scale) pytree and would break structure-
    matched tree_maps; the python loop over O(10) leaves is free under jit.
    """
    assert stochastic_round in ("none", "nu", "both")

    def _store_dtype(x, which):
        d = mu_dtype if which == "mu" else nu_dtype
        return d if _is_big(x) and d == FP8 else (jnp.bfloat16 if d == FP8 else d)

    def _sr_on(which):
        if stochastic_round == "both":
            return True
        return stochastic_round == "nu" and which == "nu"

    def init_fn(params):
        leaves, treedef = jax.tree_util.tree_flatten(params)

        def zero(x, which):
            d = _store_dtype(x, which)
            if d == FP8:
                # scale and scale_next MUST be distinct buffers AND distinct
                # values: two donated input leaves sharing one buffer fail
                # with INVALID_ARGUMENT on the tunneled TPU runtime (the
                # real root cause of the r9 failures — bisect in BENCH_NOTES
                # r9b), and identical constants can be CSE'd back into one
                # buffer when init runs under jit. scale's init value is
                # irrelevant: q starts at zero, so dequant is 0 * scale.
                sshape = x.shape[:-1] + (1,)
                return QLeaf(q=jnp.zeros(x.shape, jnp.int8),
                             scale=jnp.zeros(sshape, jnp.float32),
                             scale_next=jnp.ones(sshape, jnp.float32))
            return jnp.zeros(x.shape, d)

        del treedef  # structure is implied by the params tree at update time
        return AdamFp8State(
            count=jnp.zeros([], jnp.int32),
            mu=[zero(x, "mu") for x in leaves],
            nu=[zero(x, "nu") for x in leaves],
        )

    def _update_leaf(i, g, m_leaf, v_leaf, count):
        g32 = g.astype(jnp.float32)
        m32 = _dequant(m_leaf)
        v32 = _dequant(v_leaf)
        new_m = b1 * m32 + (1.0 - b1) * g32
        new_v = b2 * v32 + (1.0 - b2) * g32 * g32
        c = (count + 1).astype(jnp.float32)
        m_hat = new_m / (1.0 - b1**c)
        v_hat = new_v / (1.0 - b2**c)
        update = m_hat / (jnp.sqrt(v_hat) + eps)

        salt = count * jnp.int32(2) + jnp.int32(i * 7919)

        def store(x32, prev, which):
            dt = _store_dtype(g, which)
            # stochastic rounding only applies to NARROW storage (itemsize
            # < 4: fp8/bf16/f16): an f32-or-wider store of the f32 EMA is
            # exact, and dithering it would both waste VPU work and silently
            # change the requested dtype
            sr = _sr_on(which) and jnp.dtype(dt).itemsize < 4
            noise = (
                _hash_bits(x32.shape, salt + (0 if which == "mu" else 1))
                if sr
                else None
            )
            if dt != FP8:
                if sr:
                    return _sr_cast(x32, dt, noise)
                return x32.astype(dt)
            fresh_scale = jnp.maximum(_rowabsmax(x32) / HEADROOM_TARGET, 1e-30)
            # Always quantize with the PREVIOUS step's scale (single HBM
            # pass: never wait on this step's reduction). Step 0 quantizes
            # with the init scale (1.0) — the tiny first moments round to
            # ~zero, i.e. the EMA effectively starts one step late, while
            # the step-0 PARAM update itself uses the exact f32 value. A
            # lax.cond special-casing step 0 was measured to force both f32
            # moment intermediates to materialize as cond operands
            # (2 x 5.4 GB on the flagship -> OOM, r9).
            return QLeaf(q=_quantize(x32, prev.scale_next, sr, noise),
                         scale=prev.scale_next, scale_next=fresh_scale)

        return update.astype(g.dtype), store(new_m, m_leaf, "mu"), store(new_v, v_leaf, "nu")

    def update_fn(updates, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        outs = [
            _update_leaf(i, g, m, v, state.count)
            for i, (g, m, v) in enumerate(zip(leaves, state.mu, state.nu))
        ]
        new_updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        return new_updates, AdamFp8State(
            count=state.count + 1,
            mu=[o[1] for o in outs],
            nu=[o[2] for o in outs],
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam_fp8(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=FP8,
    nu_dtype=FP8,
    stochastic_round: str = "both",
) -> optax.GradientTransformation:
    """Adam with fp8 moment storage; drop-in for optax.adam / adam_lean."""
    return optax.chain(
        scale_by_adam_fp8(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype,
            stochastic_round=stochastic_round,
        ),
        optax.scale(-learning_rate),
    )
