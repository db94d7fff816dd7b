"""Data-parallel (and dense-matmul tensor-parallel-ready) train/eval steps.

New TPU-native capability (reference has none — SURVEY.md section 2.9). The
train step is one jit-compiled SPMD program over the mesh: parameters and
optimizer state replicated, batch sharded on the ``data`` axis, gradient
all-reduce inserted by XLA (no explicit collectives needed at this model
scale). Multi-host: the same code runs under jax.distributed with a DCN-major
mesh; per-host ingest feeds only the local shard (data/ingest.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh

from trustedai_cl_vae_ad_tpu.models.cvae import AbstractCVAE
from trustedai_cl_vae_ad_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)
from trustedai_cl_vae_ad_tpu.utils.compile import optioned_jit


def build_train_step(
    core: AbstractCVAE,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    opt_state_shardings=None,
) -> Callable:
    """jit-compiled sharded train step:
    (params, opt_state, x[batch-sharded], rng) -> (params, opt_state, loss, x_hat).

    ``opt_state_shardings`` (e.g. parallel.zero.zero1_shardings) shards the
    optimizer state — ZeRO-1: GSPMD slices the gradients into each local
    moment update and all-gathers the parameter delta.
    """
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    osh = rep if opt_state_shardings is None else opt_state_shardings
    return _jit_train_step(core, optimizer, params_shardings=rep,
                           opt_state_shardings=osh, batch_shardings=bsh,
                           replicated=rep)


def build_train_step_sharded(
    core: AbstractCVAE,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params_shardings,
    opt_state_shardings,
) -> Callable:
    """Fully explicit composed layout: dp x tp x zero1 on ONE mesh.

    ``params_shardings`` (parallel/tp.param_shardings: big dense kernels
    P(None, 'model')) and ``opt_state_shardings`` (parallel/zero
    .zero1_shardings on the TP-initialized state: moments P('data', 'model')
    / P('data')) pin both the input and output placements, so the layout is
    stable across steps — GSPMD derives the schedule: reduce-scatter(grads)
    into each local moment update, all-gather(param delta), model-axis
    collectives for the sharded matmuls.
    """
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return _jit_train_step(core, optimizer, params_shardings=params_shardings,
                           opt_state_shardings=opt_state_shardings,
                           batch_shardings=bsh, replicated=rep)


def _jit_train_step(core, optimizer, *, params_shardings, opt_state_shardings,
                    batch_shardings, replicated):
    """Shared step body for both parallel layouts: the math must never
    diverge between the replicated-params and TP-sharded builders — only the
    in/out placements differ."""

    def train_step(params, opt_state, x, rng):
        def loss_fn(p):
            loss_dict, x_hat = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
            return loss_dict["loss"], (loss_dict, x_hat)

        grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss_dict, x_hat

    return optioned_jit(
        train_step,
        in_shardings=(params_shardings, opt_state_shardings, batch_shardings,
                      replicated),
        out_shardings=(params_shardings, opt_state_shardings, replicated,
                       batch_shardings),
        donate_argnums=(0, 1),
    )


def build_eval_step(core: AbstractCVAE, mesh: Mesh) -> Callable:
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def eval_step(params, x):
        return core.compute_loss(params, x, training=False, return_inf=False)

    return jax.jit(eval_step, in_shardings=(rep, bsh), out_shardings=rep)


def build_forward_step(core: AbstractCVAE, mesh: Mesh) -> Callable:
    """Sharded call_detailed for bulk offline scoring (anomaly two-pass)."""
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def fwd(params, x):
        return core.call_detailed(params, x, training=False)

    return jax.jit(fwd, in_shardings=(rep, bsh), out_shardings=bsh)
