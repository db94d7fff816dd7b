"""Opt-in per-compile XLA compiler options for the training hot paths.

Profile-guided compiler tuning on this runtime cannot go through XLA_FLAGS:
compilation happens on the REMOTE side of the tunnel and the client-side XLA
rejects every TPU compiler flag at parse ("Unknown flag in XLA_FLAGS"). PJRT
per-compile options DO ship through — ``lowered.compile(compiler_options=...)``
is validated and honored by the remote compiler (BENCH_NOTES r10: a bogus
option name fails the remote compile; a real one changes the schedule).

Measured win (benchmarks/r9_xla_flags.py, flagship b768 train+score step):
``xla_tpu_scoped_vmem_limit_kib=98304`` lifts throughput 5,701 -> 6,007
frames/s (+5.4%) by giving the fusion pass a larger VMEM tile budget for the
HBM-bound Adam/narrow-conv fusions.

Usage: set ``TCVAE_COMPILER_OPTIONS="k=v,k=v"`` in the environment, or
``training.compiler_options: "k=v,..."`` in the YAML config (train.py exports
it to the env before building the model). Options are applied to the jit
train-step sites via :func:`optioned_jit`; everything else (eval/serving
dispatches, tests) compiles normally. Unknown options on the current backend
(e.g. TPU names on the CPU tests backend) fall back to the un-optioned
executable with a one-time warning instead of failing the run.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax

_ENV = "TCVAE_COMPILER_OPTIONS"
_warned: set = set()


def compiler_options() -> Optional[Dict[str, Any]]:
    """Parse ``TCVAE_COMPILER_OPTIONS`` ("k=v,k=v") into typed PJRT options.

    PJRT validates option TYPES, not just names ("'false' is not a valid bool
    value"), so values are converted: true/false -> bool, digits -> int,
    everything else stays str. Empty/unset -> None (plain jit path).
    """
    spec = os.environ.get(_ENV, "").strip()
    if not spec:
        return None
    out: Dict[str, Any] = {}
    for kv in spec.split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(f"{_ENV}: expected k=v, got {kv!r}")
        k, v = kv.split("=", 1)
        lv = v.strip().lower()
        if lv in ("true", "false"):
            out[k.strip()] = lv == "true"
        elif lv.lstrip("+-").isdigit():
            out[k.strip()] = int(lv)
        else:
            out[k.strip()] = v.strip()
    return out or None


def _signature_key(args, kwargs):
    """Dispatch-cache key: tree structure + array (shape, dtype) per leaf.

    Non-array leaves key by (type, value) — safe for the train-step sites
    (all-array signatures) and correct for static flags; a float-valued
    dynamic argument would fragment the cache, so don't wrap such sites.
    """
    tree = (args, tuple(sorted(kwargs.items())))
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sig = []
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            sig.append((tuple(leaf.shape), str(leaf.dtype)))
        else:
            sig.append((type(leaf).__name__, leaf))
    return treedef, tuple(sig)


def _is_option_rejection(msg: str, opts) -> bool:
    """True only for a compiler rejection of THESE options — the message must
    both carry the PJRT rejection phrasing ("No such compile option: 'k'" /
    "'v' is not a valid <type> value") and name one of the option keys or
    values. A transient remote-compile failure that merely contains "compile
    option" or "not a valid" must NOT be treated as a rejection: the fallback
    caches an un-optioned executable under the options key, which would pin
    options off for the rest of the process (ADVICE r3)."""
    if "compile option" not in msg and "not a valid" not in msg:
        return False
    # exact quoted-token matches only: a bare substring test on short values
    # ("1", "true") matches inside unrelated transient errors ("attempt 1 of
    # 3"), re-pinning options off — the precise failure this guard exists for
    lmsg = msg.lower()
    return any(f"'{k}'" in msg for k in opts) or any(
        f"'{str(v).lower()}' is not a valid" in lmsg for v in opts.values()
    )


def _compile_with_options(lowered, opts):
    """``lowered.compile(compiler_options=opts)`` with the unknown-option
    fallback (e.g. TPU option names on the CPU tests backend): warn once and
    compile un-optioned instead of failing the run. Rejections are
    deterministic per backend (the option name is unknown), so caching the
    fallback executable is safe; transient failures re-raise."""
    if not opts:
        return lowered.compile()
    try:
        return lowered.compile(compiler_options=opts)
    except Exception as e:
        msg = str(e)
        if _is_option_rejection(msg, opts):
            if _ENV not in _warned:
                _warned.add(_ENV)
                print(
                    f"WARNING: {_ENV}={os.environ.get(_ENV)!r} rejected "
                    f"by this backend ({msg.splitlines()[0]}); "
                    "compiling without options."
                )
            return lowered.compile()
        raise


def _options_key(opts) -> tuple:
    return tuple(sorted(opts.items())) if opts else ()


class _OptionedLowered:
    """Proxy over ``jax.stages.Lowered`` whose ``.compile()`` applies the env
    options and populates the wrapper's dispatch cache — so a warmup's
    ``fn.lower(args).compile()`` produces the SAME executable the first real
    call dispatches to (a plain forward of ``jitted.lower`` would pre-compile
    an un-optioned executable the call path never reuses, wasting the 90-200 s
    remote compile warmup exists to avoid)."""

    def __init__(self, lowered, cache, sig):
        self._lowered = lowered
        self._cache = cache
        self._sig = sig

    def compile(self, compiler_options=None, **kw):
        opts = compiler_options if compiler_options is not None else _env_opts()
        if kw:  # unusual extras: compile directly, don't cache
            return self._lowered.compile(compiler_options=opts or None, **kw)
        if not opts:
            # no-options warmup: don't cache here — the call path's fast
            # branch dispatches through the plain jitted fn (never reads the
            # cache), and the persistent compile cache (TCVAE_COMPILE_CACHE)
            # is what makes its first dispatch reuse this compile's work
            return self._lowered.compile()
        key = (_options_key(opts), self._sig)
        compiled = self._cache.get(key)
        if compiled is None:
            compiled = _compile_with_options(self._lowered, opts)
            self._cache[key] = compiled
        return compiled

    def __getattr__(self, name):  # as_text, cost_analysis, ...
        return getattr(self._lowered, name)


def _env_opts():
    return compiler_options() or {}


def optioned_jit(fun: Callable, **jit_kwargs) -> Callable:
    """``jax.jit`` that honors ``TCVAE_COMPILER_OPTIONS`` when set.

    Dispatches to the plain jitted function when the env var is unset AT CALL
    TIME (so train.py can export the config knob after import). When set,
    lazily ``lower().compile(compiler_options=...)`` once per (options, call
    signature) — donation/sharding semantics come from the jit_kwargs the
    lowering derives from; changing the options mid-process compiles fresh
    executables rather than silently reusing stale ones. If the backend
    rejects an option name (e.g. TPU options on CPU), warns once and falls
    back to the un-optioned executable.

    ``.lower`` is forwarded through a proxy whose ``.compile()`` applies the
    same options and shares the dispatch cache (warmup paths pre-compile
    through it and the first call reuses the executable). With no options
    set, warmup + first call go through jax.jit's own path instead — there
    the warmup's payoff comes from the persistent compile cache
    (TCVAE_COMPILE_CACHE), same as any plain-jit warmup in this repo.
    """
    jitted = jax.jit(fun, **jit_kwargs)
    cache: dict = {}

    def call(*args, **kwargs):
        opts = compiler_options()
        if not opts:
            return jitted(*args, **kwargs)
        key = (_options_key(opts), _signature_key(args, kwargs))
        compiled = cache.get(key)
        if compiled is None:
            lowered = jitted.lower(*args, **kwargs)
            compiled = _compile_with_options(lowered, opts)
            cache[key] = compiled
        return compiled(*args, **kwargs)

    def lower(*args, **kwargs):
        return _OptionedLowered(
            jitted.lower(*args, **kwargs), cache, _signature_key(args, kwargs))

    call.lower = lower  # type: ignore[attr-defined]
    call._jitted = jitted  # type: ignore[attr-defined]  # introspection/tests
    call._options_cache = cache  # type: ignore[attr-defined]
    return call
