"""Tracing / profiling helpers (the aux subsystem the reference lacks).

The reference's only instrumentation is hand-rolled wall-clock prints in the
Qt loop (camera_streamer_qt.py:1111-1139, SURVEY.md section 5.1). Here:
  * ``trace(logdir)`` wraps a block in a jax.profiler trace (viewable in
    TensorBoard / Perfetto);
  * ``StepTimer`` measures per-step wall time with a correct device fence —
    on some TPU runtimes ``block_until_ready`` does not synchronize (verified
    empirically: 50 PFLOPS "measured" on a 197 TFLOP chip), so the fence is a
    device->host scalar fetch;
  * ``ema_rate`` reproduces the reference's process_rate EMA (:1130-1131).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def defer_signals(sigs=None):
    """Defer SIGINT/SIGTERM handling to the end of the block.

    Used around every donating-dispatch + state-assignment window
    (VAEModel.train_step_and_run, the streaming engines' frame/CL steps): the
    step DONATES its input buffers, so a KeyboardInterrupt delivered between
    donation and the state re-assignment leaves the caller referencing
    deleted device arrays — the rescue save then dies with "Array has been
    deleted". Temporarily swaps in a handler that only records the signal,
    then restores the original handler on exit and re-raises any recorded
    signals there, where the state is whole. Handler swap (not
    pthread_sigmask) because the OS may deliver the signal to ANY unblocked
    thread — masking only the main thread still lets the Python-level
    handler fire mid-block. Python runs signal handlers in the main thread
    only, and signal.signal is main-thread-only, so this is a no-op
    elsewhere. A few µs per step against multi-ms steps.
    """
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        yield
        return
    if sigs is None:
        sigs = (signal.SIGINT, signal.SIGTERM)
    pending: list[int] = []
    previous = {}
    for s in sigs:
        previous[s] = signal.signal(s, lambda signum, frame: pending.append(signum))
    try:
        yield
    finally:
        for s, handler in previous.items():
            signal.signal(s, handler)
        # re-deliver through the restored dispositions, once per distinct
        # signal (SIG_DFL terminates here — correct deferral semantics)
        for signum in dict.fromkeys(pending):
            signal.raise_signal(signum)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_fence(tree) -> float:
    """Reliable device sync: fetch a scalar derived from the first leaf.

    Indexes a single element rather than ravel-then-slice: an eager ravel
    dispatches a full-tensor reshape copy, which both wastes bandwidth and
    can OOM when fencing a large batch at the HBM edge (observed on a
    310 MB f32 batch next to the 1.34B-param train state).
    """
    leaf = jax.tree_util.tree_leaves(tree)[0]
    ndim = getattr(leaf, "ndim", 0)
    if ndim:  # plain Python scalars / 0-d arrays are not subscriptable
        leaf = leaf[(0,) * ndim]
    return float(jnp.asarray(leaf, jnp.float32))


class StepTimer:
    """Times jitted steps with a device fence; keeps a history."""

    def __init__(self):
        self.history: list = []

    @contextlib.contextmanager
    def step(self, fence_tree=None):
        t0 = time.perf_counter()
        yield
        if fence_tree is not None:
            device_fence(fence_tree)
        self.history.append(time.perf_counter() - t0)

    def p50_ms(self) -> Optional[float]:
        if not self.history:
            return None
        return float(np.percentile(np.array(self.history) * 1000.0, 50))

    def summary(self) -> dict:
        if not self.history:
            return {}
        arr = np.array(self.history) * 1000.0
        return {
            "p50_ms": float(np.percentile(arr, 50)),
            "p95_ms": float(np.percentile(arr, 95)),
            "mean_ms": float(arr.mean()),
            "n": len(arr),
        }


def ema_rate(new_value: float, prev: float, weight: float = 0.9) -> float:
    """The reference's process_rate EMA (camera_streamer_qt.py:1130-1131)."""
    return weight * new_value + (1.0 - weight) * prev


def rss_mb() -> float:
    """This process's resident set size in MB (Linux /proc; 0.0 elsewhere).

    Operational guard for long streaming runs: the tunneled TPU client leaks
    host RSS proportional to host->device upload bytes (~1.6 MB/tick at
    flagship 1080p — isolated to the client, not the engine: CPU control
    runs flat; BENCH_NOTES r7, benchmarks/SOAK*.json). The streaming CLIs'
    ``--max-rss-mb`` polls this to trigger a graceful save-and-exit before
    the OOM killer fires (SERVING.md "Host memory").
    """
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e6
    except (OSError, ValueError, IndexError):
        return 0.0
