"""ops/fused_dense_adam.py: fused dense-gradient + Adam update kernel.

CPU coverage: interpret-mode kernel vs the jnp reference (both grid layouts),
adam_lean equivalence, and in-place aliasing safety. The kernel's TPU
validation + perf run lives in benchmarks/r11_fused_dense_adam.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trustedai_cl_vae_ad_tpu.ops import fused_dense_adam as fda


def _operands(K, M, N, dtype, seed=0, integer=False):
    rng = np.random.RandomState(seed)
    if integer:
        x = jnp.asarray(rng.randint(-4, 5, (K, M)), dtype)
        dz = jnp.asarray(rng.randint(-4, 5, (K, N)), dtype)
    else:
        x = jnp.asarray(rng.randn(K, M), dtype)
        dz = jnp.asarray(rng.randn(K, N) * 0.01, dtype)
    w = jnp.asarray(rng.randn(M, N) * 0.1, dtype)
    mu = jnp.asarray(rng.randn(M, N) * 0.01, dtype)
    nu = jnp.asarray(np.abs(rng.randn(M, N)) * 1e-4, dtype)
    return x, dz, w, mu, nu


KW = dict(lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, count=7)


def _run_interpret(*args, **kw):
    old = fda._INTERPRET
    fda._INTERPRET = True
    try:
        return fda.fused_dense_grad_adam(*args, **kw)
    finally:
        fda._INTERPRET = old


@pytest.mark.parametrize(
    "K,M,N,dtype",
    [
        (32, 256, 384, jnp.float32),     # dz-resident 1-D grid
        (48, 512, 256, jnp.bfloat16),    # dz-resident, bf16 storage
        (64, 128, 131072, jnp.bfloat16), # dz too big -> x-resident 1-D grid
    ],
)
def test_kernel_matches_reference(K, M, N, dtype):
    ops = _operands(K, M, N, dtype)
    ref = fda.fused_dense_grad_adam_reference(*ops, **KW)
    out = _run_interpret(*ops, **KW)
    # tiled dot accumulation order and FMA contraction differ from the
    # whole-array eager reference: tolerate ~1 ulp of the storage dtype
    rtol = 1e-5 if dtype == jnp.float32 else 1 / 96
    for name, a, b in zip(("w", "mu", "nu"), out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=rtol, atol=1e-5, err_msg=name)


def test_kernel_streaming_2d_grid(monkeypatch):
    """Both-operands-big path: force the 2-D streaming grid on small shapes
    by shrinking the residency/block budgets."""
    monkeypatch.setattr(fda, "_RESIDENT_BYTES", 1 << 12)
    monkeypatch.setattr(fda, "_BLOCK_BYTES", 64 * 1024)
    ops = _operands(32, 512, 768, jnp.float32)
    ref = fda.fused_dense_grad_adam_reference(*ops, **KW)
    out = _run_interpret(*ops, **KW)
    for name, a, b in zip(("w", "mu", "nu"), out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name)


def test_integer_inputs_tight():
    """Integer-valued operands make the dot exact in any order: only FMA
    contraction differences remain (sub-ulp of f32)."""
    ops = _operands(32, 256, 384, jnp.float32, integer=True)
    ref = fda.fused_dense_grad_adam_reference(*ops, **KW)
    out = _run_interpret(*ops, **KW)
    for name, a, b in zip(("w", "mu", "nu"), out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=3e-7, err_msg=name)


def test_matches_adam_lean_step():
    """One fused step == one adam_lean step on the same dense kernel.

    adam_lean (ops/adam.py) runs the mu EMA in the storage dtype (optax
    structure) while the kernel runs every EMA in f32; with f32 storage the
    two are the same arithmetic, so f32 must agree tightly."""
    import optax

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    K, M, N = 24, 160, 192
    x, dz, w, mu, nu = _operands(K, M, N, jnp.float32, seed=3)

    g = jax.lax.dot_general(
        x, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    opt = adam_lean(1e-3, mu_dtype=jnp.float32, nu_dtype=jnp.float32)
    state = opt.init({"k": w})
    # preload the moment state so the comparison covers count > 0 paths
    inner = state[0]._replace(mu={"k": mu}, nu={"k": nu},
                              count=jnp.asarray(6, jnp.int32))
    state = (inner,) + tuple(state[1:])
    updates, _ = opt.update({"k": g}, state, {"k": w})
    w_lean = optax.apply_updates({"k": w}, updates)["k"]

    w_fused, _, _ = fda.fused_dense_grad_adam_reference(x, dz, w, mu, nu, **KW)
    np.testing.assert_allclose(np.asarray(w_fused), np.asarray(w_lean),
                               rtol=2e-6, atol=2e-7)


def test_multi_step_training_equivalence():
    """N fused steps track N optax steps (bf16 storage, bounded drift)."""
    import optax

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    K, M, N = 16, 96, 128
    rng = np.random.RandomState(1)
    w0 = jnp.asarray(rng.randn(M, N) * 0.1, jnp.bfloat16)

    opt = adam_lean(1e-3)
    state = opt.init({"k": w0})
    w_lean = {"k": w0}
    w_f = w0
    mu = jnp.zeros_like(w0)
    nu = jnp.zeros_like(w0)
    for step in range(5):
        x = jnp.asarray(rng.randn(K, M), jnp.bfloat16)
        dz = jnp.asarray(rng.randn(K, N) * 0.01, jnp.bfloat16)
        g = jax.lax.dot_general(
            x, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        updates, state = opt.update({"k": g}, state, w_lean)
        w_lean = optax.apply_updates(w_lean, updates)
        w_f, mu, nu = fda.fused_dense_grad_adam_reference(
            x, dz, w_f, mu, nu, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8,
            count=step + 1)
    diff = np.abs(np.asarray(w_f, np.float32) - np.asarray(w_lean["k"], np.float32))
    scale = np.abs(np.asarray(w_lean["k"], np.float32)) + 1e-3
    rel = diff / scale
    # adam_lean's mu EMA runs in bf16 arithmetic (optax structure); the kernel
    # runs it in f32 — a deliberate equal-or-better deviation, so the drift is
    # a few bf16 ulps/step in the tail, tiny on average
    assert float(rel.max()) < 0.08
    assert float(rel.mean()) < 0.005


def test_inplace_aliasing_under_donation():
    """jit(donate) + input_output_aliases: outputs are correct when the
    inputs' buffers are reused (the r1 fused-adam failure mode was extra
    copies / garbage under aliasing)."""
    ops = _operands(32, 256, 384, jnp.float32, seed=5)
    ref = fda.fused_dense_grad_adam_reference(*ops, **KW)

    old = fda._INTERPRET
    fda._INTERPRET = True
    try:
        step = jax.jit(
            lambda x, dz, w, mu, nu: fda.fused_dense_grad_adam(
                x, dz, w, mu, nu, **KW),
            donate_argnums=(2, 3, 4),
        )
        out = step(*ops)
    finally:
        fda._INTERPRET = old
    for name, a, b in zip(("w", "mu", "nu"), out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_cpu_fallback_path():
    """Off-TPU (no interpret flag) the public API routes to the reference."""
    ops = _operands(8, 64, 64, jnp.float32, seed=9)
    out = fda.fused_dense_grad_adam(*ops, **KW)
    ref = fda.fused_dense_grad_adam_reference(*ops, **KW)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_picker():
    assert fda._pick_block(268800, 16, 256) == 256
    assert fda._pick_block(2000, 16, 400) == 400
    assert fda._pick_block(134400, 128, 2730) == 2688
    # no aligned divisor -> falls back to dim (caller then rejects)
    assert fda._pick_block(130, 128, 4096) == 130
