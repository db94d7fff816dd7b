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
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trustedai_cl_vae_ad_tpu.parallel.mesh import DATA_AXIS, replicated_sharding


def zero1_shardings(opt_state: Any, mesh: Mesh, min_elems: int = 2**16) -> Any:
    """Sharding pytree for an optax state: big moment leaves P('data'),
    everything else replicated. Usable as jit in/out_shardings and with
    jax.device_put."""
    n_data = mesh.shape[DATA_AXIS]
    rep = replicated_sharding(mesh)
    sharded = NamedSharding(mesh, P(DATA_AXIS))

    def leaf_sharding(x):
        shape = getattr(x, "shape", None)
        if (
            shape
            and len(shape) >= 1
            and shape[0] % n_data == 0
            and int(np.prod(shape)) >= min_elems
        ):
            return sharded
        return rep

    return jax.tree_util.tree_map(leaf_sharding, opt_state)


def place_zero1(opt_state: Any, mesh: Mesh, min_elems: int = 2**16) -> Any:
    """Place an optimizer state with ZeRO-1 sharding."""
    return jax.device_put(opt_state, zero1_shardings(opt_state, mesh, min_elems))
