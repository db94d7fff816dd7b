"""ZeRO-1 optimizer-state sharding over the data axis.

New TPU-native capability (the reference has no distributed support —
SURVEY.md section 2.9). Motivation from the round-2 perf campaign
(BENCH_NOTES.md): on one 16 GB v5e the flagship's Adam moments (5.4 GB in
bf16) cap the usable batch at 512; sharding the moments over N data-parallel
chips frees (N-1)/N of that, unlocking larger per-chip batches and the
Adam-amortization the 10k-frames/s roofline requires.

Mechanics (GSPMD does the collectives): annotate each large moment leaf with
``NamedSharding(P('data'))`` on the train step's opt_state input/output.
The partitioner then slices the (replicated, all-reduced) gradients into the
local moment shard's update and all-gathers the parameter delta — i.e. the
classic reduce-scatter(grads) -> local Adam -> all-gather(params) ZeRO-1
schedule, derived from the sharding annotations rather than hand-written
collectives.

Leaves whose leading dim doesn't divide the data-axis size, or that are
small (< ``min_elems``), stay replicated — sharding a 32-element bias buys
nothing and costs a collective.

Composes with tensor parallelism on the SAME mesh: when the optimizer state
was initialized from TP-placed params (parallel/tp.py), its big dense moment
leaves already carry ``P(None, 'model')`` — zero1_shardings keeps those
model-axis dims and adds 'data' on dim 0, yielding ``P('data', 'model')``
(moments sharded over BOTH axes). The composed dp x tp x zero1 layout is the
shipped multi-chip recipe (__graft_entry__.dryrun_multichip,
tests/test_parallel.py::test_zero1_composes_with_tp).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trustedai_cl_vae_ad_tpu.parallel.mesh import DATA_AXIS, replicated_sharding


def zero1_shardings(opt_state: Any, mesh: Mesh, min_elems: int = 2**16) -> Any:
    """Sharding pytree for an optax state: big moment leaves get 'data' on
    dim 0, preserving any existing model-axis sharding on the other dims
    (TP composition); everything else keeps its placement or is replicated.
    Usable as jit in/out_shardings and with jax.device_put."""
    n_data = mesh.shape[DATA_AXIS]
    rep = replicated_sharding(mesh)

    def leaf_sharding(x):
        shape = getattr(x, "shape", None)
        # existing mesh-axis placement (e.g. tp.place_params -> optimizer
        # .init inherited P(None, 'model')) to compose with; plain host
        # arrays / SingleDeviceSharding leaves have no spec.
        sh = getattr(x, "sharding", None)
        spec = tuple(sh.spec) if isinstance(sh, NamedSharding) else ()
        if not shape:
            return NamedSharding(mesh, P(*spec)) if any(spec) else rep
        spec = spec + (None,) * (len(shape) - len(spec))

        def named(entries):
            while entries and entries[-1] is None:  # normalize: P('data',
                entries = entries[:-1]  # None) == P('data')
            return NamedSharding(mesh, P(*entries))

        if (
            shape[0] % n_data == 0
            and int(np.prod(shape)) >= min_elems
            and spec[0] is None
            and DATA_AXIS not in spec
        ):
            return named((DATA_AXIS,) + spec[1:])
        if any(a is not None for a in spec):
            return named(spec)
        return rep

    return jax.tree_util.tree_map(leaf_sharding, opt_state)


def place_zero1(opt_state: Any, mesh: Mesh, min_elems: int = 2**16) -> Any:
    """Place an optimizer state with ZeRO-1 sharding."""
    return jax.device_put(opt_state, zero1_shardings(opt_state, mesh, min_elems))
