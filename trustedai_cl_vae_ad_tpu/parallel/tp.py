"""Tensor-parallel parameter shardings for the CVAE family.

The model's memory/FLOPs are dominated by two giant dense layers (flagship:
encoder flatten->dense 268800x4000 = 1.08B params, decoder dense 2000x134400
= 269M params — >99% of all parameters). For multi-chip scaling beyond pure
data parallelism, those kernels shard over the ``model`` mesh axis:

  * encoder Dense kernels: column-sharded (output features split) — each
    chip computes a slice of the latent projection; XLA all-gathers the
    (tiny) latent activations;
  * decoder Dense_0 kernel: row-sharded on its input (latent) or column-
    sharded on output features; column sharding keeps the big activation
    sharded until the reshape.

Everything else (conv kernels, biases) is replicated — they are KBs.
GSPMD inserts the collectives; this module only declares placements.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trustedai_cl_vae_ad_tpu.parallel.mesh import MODEL_AXIS

# Kernels at least this large get model-axis sharding.
_SHARD_MIN_PARAMS = 1 << 20  # 1M


def param_shardings(params: Any, mesh: Mesh,
                    min_params: int = _SHARD_MIN_PARAMS) -> Any:
    """NamedSharding tree: column-shard big dense kernels on the model axis.

    ``min_params`` overrides the size threshold (tests shard tiny models)."""
    n_model = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def place(path, leaf):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if (
            n_model > 1
            and leaf.ndim == 2
            and leaf.size >= min_params
            and "Dense" in name
            and leaf.shape[1] % n_model == 0
        ):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return rep

    return jax.tree_util.tree_map_with_path(place, params)


def place_params(params: Any, mesh: Mesh,
                 min_params: int = _SHARD_MIN_PARAMS) -> Any:
    """device_put params according to param_shardings."""
    return jax.device_put(params, param_shardings(params, mesh, min_params))
