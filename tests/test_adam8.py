"""Tests for ops/adam8.py — fp8 (e4m3) Adam moment storage.

Covers: exactness at f32 dtypes (the quantization machinery is a no-op),
state layout (big 2-D leaves quantized, small/1-D leaves bf16), the
EMA-freeze mechanism stochastic rounding exists to fix, convergence on a
least-squares problem, and scale tracking across magnitude jumps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from trustedai_cl_vae_ad_tpu.ops.adam8 import (
    FP8,
    QLeaf,
    _sr_cast,
    adam_fp8,
    dequant,
)


def _run(opt, w0, grads):
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    step = jax.jit(
        lambda p, s, g: (lambda u_s: (optax.apply_updates(p, u_s[0]), u_s[1]))(
            opt.update(g, s, p)
        )
    )
    for g in grads:
        params, state = step(params, state, {"w": jnp.asarray(g)})
    return np.asarray(params["w"], np.float32), state


BIG = (1100, 1024)  # >= 2^20 elements: hits the fp8 path


def test_exact_match_optax_at_f32():
    rs = np.random.RandomState(0)
    w0 = rs.normal(0, 0.1, (64, 32)).astype(np.float32)
    grads = [rs.normal(0, 0.01, (64, 32)).astype(np.float32) for _ in range(10)]
    ours, _ = _run(
        adam_fp8(1e-3, mu_dtype=jnp.float32, nu_dtype=jnp.float32,
                 stochastic_round="none"),
        w0, grads,
    )
    ref, _ = _run(optax.adam(1e-3), w0, grads)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-7)


def test_state_layout():
    params = {
        "big": jnp.zeros(BIG, jnp.bfloat16),
        "small": jnp.zeros((32, 8), jnp.bfloat16),
        "bias": jnp.zeros((4096,), jnp.bfloat16),
    }
    opt = adam_fp8(1e-3)
    st = opt.init(params)
    inner = st[0]  # chain: (scale_by_adam_fp8, scale)
    leaves, _ = jax.tree_util.tree_flatten(params)
    by_shape = {l.shape: m for l, m in zip(leaves, inner.mu)}
    big = by_shape[BIG]
    assert isinstance(big, QLeaf)
    # int8 view of e4m3 bitpatterns: donation-safe + checkpoint-safe
    assert big.q.dtype == jnp.int8 and big.q.shape == BIG
    assert big.scale.shape == (BIG[0], 1) and big.scale.dtype == jnp.float32
    assert big.scale_next.shape == (BIG[0], 1)
    assert by_shape[(32, 8)].dtype == jnp.bfloat16
    assert by_shape[(4096,)].dtype == jnp.bfloat16


def test_sr_fixes_ema_freeze():
    """e4m3 RTN freezes a slow EMA (increments below the ~6% resolution
    round away); stochastic rounding tracks it in expectation. This is the
    bf16-nu freeze adam_lean fixed, 30x worse — the reason SR is the fp8
    default."""
    rs = np.random.RandomState(1)
    w0 = np.zeros(BIG, np.float32)
    g = np.full(BIG, 1e-2, np.float32)
    grads = [g] * 400
    b2 = 0.999
    target = (1.0 - b2 ** len(grads)) * 1e-4  # EMA of g^2 toward g^2

    def final_nu(mode):
        _, state = _run(adam_fp8(1e-3, stochastic_round=mode), w0, grads)
        return float(jnp.mean(dequant(state[0].nu[0])))

    nu_sr = final_nu("both")
    nu_rtn = final_nu("none")
    # SR tracks the analytic EMA; RTN stalls well below it
    assert abs(nu_sr - target) / target < 0.25, (nu_sr, target)
    assert nu_rtn < 0.6 * target, (nu_rtn, target)


def test_sr_cast_is_unbiased_bf16():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.uniform(0.5, 2.0, (4096,)).astype(np.float32))
    acc = jnp.zeros_like(x)
    for i in range(64):
        noise = jax.random.bits(jax.random.PRNGKey(i), x.shape, jnp.uint32)
        acc = acc + _sr_cast(x, jnp.bfloat16, noise).astype(jnp.float32)
    mean = acc / 64.0
    # bf16 ulp near 1.0 is ~0.0078; the 64-sample mean must sit much closer
    # to x than one ulp (unbiasedness), vs RTN's worst-case half-ulp offset
    assert float(jnp.max(jnp.abs(mean - x))) < 0.004


def test_converges_least_squares():
    """fp8 moments must not break optimization: solve a small least-squares
    problem to (near) the same loss as f32 Adam."""
    rs = np.random.RandomState(3)
    # big-leaf sized problem so the fp8 path is exercised
    w_true = rs.normal(0, 1, BIG).astype(np.float32)
    w0 = np.zeros(BIG, np.float32)

    def make_runner(opt):
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(
                lambda p: jnp.mean((p["w"] - w_true) ** 2)
            )(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        loss = None
        for _ in range(150):
            params, state, loss = step(params, state)
        return float(loss)

    ref = make_runner(optax.adam(5e-2))
    ours = make_runner(adam_fp8(5e-2))
    assert ours < max(2.0 * ref, 1e-3), (ours, ref)


def test_scale_tracks_magnitude_jump():
    """The lagged per-row scale saturates for one step after a 100x gradient
    jump, then adapts; moments must recover instead of staying clipped."""
    w0 = np.zeros(BIG, np.float32)
    small = [np.full(BIG, 1e-3, np.float32)] * 5
    big = [np.full(BIG, 1e-1, np.float32)] * 5
    _, state = _run(adam_fp8(1e-3), w0, small + big)
    m = float(jnp.mean(dequant(state[0].mu[0])))
    # analytic EMA of the mu sequence
    b1 = 0.9
    expect = 0.0
    for g in [1e-3] * 5 + [1e-1] * 5:
        expect = b1 * expect + (1 - b1) * g
    assert abs(m - expect) / expect < 0.3, (m, expect)


def test_init_scale_buffers_distinct():
    """r9b regression: init built scale and scale_next from the SAME value —
    two donated input leaves aliasing one buffer, which the tunneled TPU
    runtime rejects with a bare INVALID_ARGUMENT at update time (double
    donation). The invariant that prevents it: distinct init VALUES (so jit
    CSE cannot re-merge them into one constant) and distinct buffers."""
    params = {"big": jnp.zeros(BIG, jnp.bfloat16)}
    opt = adam_fp8(1e-3)
    st = jax.jit(opt.init)(params)
    for moment in (st[0].mu, st[0].nu):
        leaf = moment[0]  # mu/nu hold flat leaf lists (see test_state_layout)
        assert isinstance(leaf, QLeaf)
        # distinct values: zeros vs ones — CSE-proof
        assert float(jnp.max(jnp.abs(leaf.scale - leaf.scale_next))) == 1.0
        # distinct device buffers — donation-proof
        assert (leaf.scale.unsafe_buffer_pointer()
                != leaf.scale_next.unsafe_buffer_pointer())


def test_f32_storage_keeps_dtype_under_stochastic_round():
    """Regression: requesting f32 moment storage with the default
    stochastic_round='both' used to silently store bf16 (store() hardcoded
    the SR cast target), flipping the opt-state leaf dtype after the first
    update — which also breaks donation aliasing under a jitted step. f32
    storage of the f32 EMA is exact, so SR must be a no-op there."""
    params = {"big": jnp.zeros(BIG, jnp.float32)}
    opt = adam_fp8(1e-3, mu_dtype=jnp.float32, nu_dtype=jnp.float32)
    state = opt.init(params)
    assert state[0].mu[0].dtype == jnp.float32
    g = {"big": jnp.full(BIG, 1e-3, jnp.float32)}
    _, state = opt.update(g, state, params)
    assert state[0].mu[0].dtype == jnp.float32, state[0].mu[0].dtype
    assert state[0].nu[0].dtype == jnp.float32
    # and the stored value is the exact f32 EMA (no dither applied)
    np.testing.assert_allclose(
        np.asarray(state[0].mu[0]), np.full(BIG, (1 - 0.9) * 1e-3), rtol=1e-6)
