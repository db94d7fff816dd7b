"""TCVAE_COMPILER_OPTIONS / utils.compile.optioned_jit.

The knob ships per-compile XLA options to the (possibly remote) TPU compiler
— the only tuning channel on this runtime, since client-side XLA_FLAGS
rejects TPU flags at parse (BENCH_NOTES r10; measured +5.4% on the flagship
step with xla_tpu_scoped_vmem_limit_kib=98304). These tests cover the
parsing, the dispatch cache, the unknown-option fallback (TPU option names on
the CPU test backend), and end-to-end train-step equivalence.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trustedai_cl_vae_ad_tpu.utils.compile import (
    compiler_options,
    optioned_jit,
)

ENV = "TCVAE_COMPILER_OPTIONS"


@pytest.fixture(autouse=True)
def _clean_env():
    old = os.environ.pop(ENV, None)
    yield
    if old is None:
        os.environ.pop(ENV, None)
    else:
        os.environ[ENV] = old


def test_parse_unset_and_empty():
    assert compiler_options() is None
    os.environ[ENV] = ""
    assert compiler_options() is None
    os.environ[ENV] = " , "
    assert compiler_options() is None


def test_parse_typed_values():
    os.environ[ENV] = (
        "xla_tpu_scoped_vmem_limit_kib=98304,"
        "xla_tpu_enable_latency_hiding_scheduler=true,"
        "some_flag=False,some_str=auto"
    )
    opts = compiler_options()
    # PJRT validates types: bools must be bool, numbers int (not "98304")
    assert opts == {
        "xla_tpu_scoped_vmem_limit_kib": 98304,
        "xla_tpu_enable_latency_hiding_scheduler": True,
        "some_flag": False,
        "some_str": "auto",
    }


def test_parse_rejects_bare_token():
    os.environ[ENV] = "not_a_kv"
    with pytest.raises(ValueError):
        compiler_options()


def test_unset_env_uses_plain_jit_path():
    calls = []

    def f(x):
        calls.append(1)
        return x * 2.0

    g = optioned_jit(f)
    x = jnp.arange(4.0)
    np.testing.assert_allclose(g(x), x * 2.0)
    assert len(g._options_cache) == 0  # never went through the option path


def test_valid_cpu_option_compiles_and_matches():
    # xla_cpu_enable_fast_math is accepted by the CPU PJRT compiler (typed
    # bool); result must match the plain jit path bit-for-bit at f32
    def f(x):
        return jnp.sin(x) * x + 1.0

    x = jnp.linspace(0.0, 3.0, 16)
    plain = jax.jit(f)(x)
    os.environ[ENV] = "xla_cpu_enable_fast_math=false"
    g = optioned_jit(f)
    np.testing.assert_array_equal(np.asarray(g(x)), np.asarray(plain))
    assert len(g._options_cache) == 1
    g(x)  # same signature: no second compile
    assert len(g._options_cache) == 1
    g(jnp.linspace(0.0, 3.0, 8))  # new shape: one more entry
    assert len(g._options_cache) == 2


def test_unknown_option_falls_back(capsys):
    # TPU option names don't exist on the CPU backend: the wrapper must warn
    # once and still produce correct results (not crash the run)
    os.environ[ENV] = "xla_tpu_scoped_vmem_limit_kib=98304"
    g = optioned_jit(lambda x: x + 1.0)
    x = jnp.ones(4)
    np.testing.assert_allclose(g(x), x + 1.0)
    # cached: the fallback executable is reused, the warning prints at most
    # once per process (the _warned set is module-global)
    np.testing.assert_allclose(g(x), x + 1.0)
    assert len(g._options_cache) == 1


def test_wrapper_forwards_lower():
    g = optioned_jit(lambda x: x * 3.0)
    lowered = g.lower(jnp.ones(4))
    compiled = lowered.compile()
    np.testing.assert_allclose(compiled(jnp.ones(4)), 3.0 * jnp.ones(4))


def test_train_step_equivalent_with_options(tiny_config):
    """End-to-end: a VAEModel train step with a (CPU-valid) compiler option
    produces the same numbers as the plain path."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    tiny_config["model"]["type"] = "KurtosisGlobal"
    tiny_config["data"]["image_size"] = [32, 32, 3]
    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)

    def run():
        m = load_model_from_config(tiny_config)
        m.compile(learning_rate=1e-3)
        out = [float(m.train_step(x)["loss"]) for _ in range(2)]
        return out

    plain = run()
    os.environ[ENV] = "xla_cpu_enable_fast_math=false"
    optioned = run()
    assert plain == optioned


def test_option_change_compiles_fresh_executable():
    """Regression: the dispatch cache was keyed only by call signature, so
    changing TCVAE_COMPILER_OPTIONS mid-process silently reused executables
    compiled under the OLD options (any in-process A/B sweep compared
    identical binaries). The key must include the option values."""
    calls = []

    def f(x):
        calls.append(1)
        return x * 2.0

    fn = optioned_jit(f)
    x = jnp.ones((4,))
    # CPU rejects the TPU option name -> fallback path; caching still applies
    os.environ[ENV] = "xla_tpu_scoped_vmem_limit_kib=65536"
    fn(x)
    n_after_first = len(fn._options_cache)
    fn(x)
    assert len(fn._options_cache) == n_after_first  # same options: cache hit
    os.environ[ENV] = "xla_tpu_scoped_vmem_limit_kib=98304"
    fn(x)
    assert len(fn._options_cache) == n_after_first + 1  # new options: fresh


def test_warmup_lower_compile_populates_dispatch_cache():
    """Regression: .lower was forwarded straight to the plain jit, so a
    warmup's fn.lower(x).compile() pre-compiled an executable the call path
    never reused (double 90-200 s compile on remote runtimes). The proxy's
    .compile() must land in the same cache the first call reads."""
    def f(x):
        return x + 1.0

    fn = optioned_jit(f)
    x = jnp.ones((4,))
    os.environ[ENV] = "xla_tpu_scoped_vmem_limit_kib=98304"
    warm = fn.lower(x).compile()
    assert len(fn._options_cache) == 1
    # the first real call dispatches to the SAME executable object
    key, cached = next(iter(fn._options_cache.items()))
    assert cached is warm
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(x) + 1.0)
    assert len(fn._options_cache) == 1  # no second compile
    # the proxy still exposes Lowered introspection
    assert "HloModule" in fn.lower(x).as_text() or "module" in fn.lower(x).as_text()


def test_transient_failure_is_not_classified_as_rejection():
    """A transient compile failure whose message merely contains the phrases
    'compile option' / 'not a valid' must re-raise, not silently pin options
    off via the fallback cache (ADVICE r3). Only messages naming one of the
    current option keys/values count as rejections."""
    from trustedai_cl_vae_ad_tpu.utils.compile import _is_option_rejection

    opts = {"xla_tpu_scoped_vmem_limit_kib": 98304}
    # genuine rejections: the message names the option key or value
    assert _is_option_rejection(
        "INVALID_ARGUMENT: No such compile option: 'xla_tpu_scoped_vmem_limit_kib'",
        opts,
    )
    assert _is_option_rejection("'false' is not a valid bool value", {"k": False})
    # transient failures that happen to contain the phrases: NOT rejections
    assert not _is_option_rejection(
        "remote compile failed: server said 'not a valid session token'", opts
    )
    assert not _is_option_rejection(
        "tunnel error while shipping compile option payload", opts
    )

    class _Boom:
        def compile(self, compiler_options=None):
            if compiler_options:
                raise RuntimeError("transient: connection reset (not a valid frame)")
            raise AssertionError("fallback path must not run on transient errors")

    from trustedai_cl_vae_ad_tpu.utils.compile import _compile_with_options

    with pytest.raises(RuntimeError, match="transient"):
        _compile_with_options(_Boom(), opts)


def test_short_option_values_do_not_match_transient_text():
    """Option VALUES like 1/0/true appear inside unrelated transient messages
    ("attempt 1 of 3"); the matcher must require the exact quoted-token
    rejection phrasing, not a bare substring."""
    from trustedai_cl_vae_ad_tpu.utils.compile import _is_option_rejection

    assert not _is_option_rejection(
        "remote compile failed: not a valid frame (attempt 1 of 3)",
        {"xla_tpu_foo": 1},
    )
    assert not _is_option_rejection(
        "compile option stream interrupted, retry true", {"k": True}
    )
    # the genuine quoted forms still classify
    assert _is_option_rejection("No such compile option: 'k'", {"k": True})
    assert _is_option_rejection("'1' is not a valid bool value", {"k": 1})
