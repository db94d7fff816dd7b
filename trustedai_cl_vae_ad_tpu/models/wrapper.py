"""Stateful convenience wrapper preserving the reference's mutable model API.

The reference exposes a Keras model with mutable attributes and methods
(abstract_cvae.py:109-178): ``encode/reparameterize/decode/call/call_detailed/
sample/compute_loss/train_step/test_step/train_step_and_run``, plus runtime
mutation of ``model.beta`` (camera_streamer_qt.py:1336) and the optimizer
learning rate (camera_streamer_qt.py:1329). ``VAEModel`` reproduces that
surface on top of jit-compiled pure functions:

  * params / optimizer state are pytrees held on device;
  * the learning rate is an optax injected hyperparameter, so the continual-
    learning loop can re-dial it per step WITHOUT recompiling the train step;
  * ``beta`` (input-noise stddev) is passed as a traced scalar argument for
    the same reason;
  * each jitted function is compiled once per input shape and reused.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trustedai_cl_vae_ad_tpu.models.cvae import AbstractCVAE


def make_optimizer(learning_rate: float, param_dtype=jnp.float32,
                   name: Optional[str] = None) -> optax.GradientTransformation:
    """Adam with an injectable (runtime-mutable) learning rate.

    Mirrors reference train.py:99-101 (tf.keras.optimizers.Adam(lr)); the
    injection replaces camera_streamer_qt.py:1329's
    ``tf.keras.backend.set_value(optimizer.learning_rate, lr)``.

    ``name`` (config key ``training.optimizer``) selects the variant:
      * ``adam`` — stock optax Adam (f32-param default);
      * ``adam_lean`` — bf16 moment storage, f32 EMA arithmetic
        (ops/adam.py; the bf16-param default — stock optax with bf16 params
        stores the moments bf16 AND runs the nu EMA in bf16 arithmetic,
        where b2=0.999 increments round away; BENCH_NOTES.md round 2);
      * ``adam_fp8`` — float8_e4m3 moment storage with lagged per-row
        scales (ops/adam8.py; halves moment memory again — experimental).
    """
    if name is None:
        name = "adam_lean" if param_dtype == jnp.bfloat16 else "adam"
    if name == "adam_fp8":
        from trustedai_cl_vae_ad_tpu.ops.adam8 import adam_fp8

        def _fp8_lr(learning_rate):
            return adam_fp8(learning_rate)

        return optax.inject_hyperparams(_fp8_lr)(learning_rate=learning_rate)
    if name == "adam_lean":
        from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

        # wrap so inject_hyperparams only sees learning_rate (it would try to
        # trace the dtype defaults into device arrays otherwise)
        def _lean_lr(learning_rate):
            return adam_lean(learning_rate)

        return optax.inject_hyperparams(_lean_lr)(learning_rate=learning_rate)
    if name != "adam":
        raise ValueError(f"unknown training.optimizer {name!r} "
                         "(expected adam | adam_lean | adam_fp8)")
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def _as_image_input(x):
    """Ship image batches to the jits: uint8 passes through raw (the core
    normalizes on device — models/cvae.normalize_image_input — and the
    transfer is 4x smaller); anything else widens to float32 as before."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return x
    return x.astype(jnp.float32)


class VAEModel:
    """Stateful facade over a functional AbstractCVAE core."""

    def __init__(self, core: AbstractCVAE, seed: int = 0):
        self.core = core
        self.config = core.config
        self.latent_size = core.latent_size
        self.encoder_input_shape = core.encoder_input_shape
        self._rng = jax.random.PRNGKey(seed)
        self.params = core.init(self._next_rng())
        self.optimizer: Optional[optax.GradientTransformation] = None
        self.opt_state = None
        self.mesh = None
        self._zero1 = False
        self._beta = jnp.float32(core.beta)
        self._build_jitted()

    # -- mutable hyperparameters --------------------------------------------------
    @property
    def beta(self) -> float:
        return float(self._beta)

    @beta.setter
    def beta(self, value: float) -> None:
        self._beta = jnp.float32(value)

    @property
    def learning_rate(self) -> float:
        assert self.opt_state is not None, "model not compiled"
        return float(self.opt_state.hyperparams["learning_rate"])

    def set_learning_rate(self, lr: float) -> None:
        """Re-dial Adam's lr in-place; no recompilation (cf. streamer :1329)."""
        assert self.opt_state is not None, "model not compiled"
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def compile(self, learning_rate: Optional[float] = None, mesh=None,
                zero1: Optional[bool] = None) -> None:
        """Attach the optimizer (reference train.py:99-101).

        With ``mesh`` set, parameters are replicated over the mesh and the
        train step compiles as one SPMD program with the batch sharded on the
        'data' axis (XLA inserts the gradient all-reduce). ``zero1`` (or
        config ``training.zero1``) additionally shards the Adam moments over
        the data axis (parallel/zero.py), freeing (N-1)/N of the optimizer
        memory per chip.
        """
        if learning_rate is None:
            learning_rate = float(self.config["training"]["learning_rate"])
        if zero1 is None:
            zero1 = bool(self.config.get("training", {}).get("zero1", False))
        self.optimizer = make_optimizer(
            learning_rate, param_dtype=self.core.param_dtype,
            name=self.config.get("training", {}).get("optimizer"),
        )
        self.mesh = mesh
        self._zero1 = zero1 and mesh is not None
        if mesh is not None:
            from trustedai_cl_vae_ad_tpu.parallel.mesh import (
                replicate,
                replicated_from_local,
                replicated_sharding,
            )

            multiproc = jax.process_count() > 1
            if multiproc:
                # a DCN-spanning mesh holds non-addressable devices:
                # device_put can't place there — assemble the global
                # replicated tree from (identical) per-host values instead
                self.params = replicated_from_local(
                    jax.device_get(self.params), mesh)
            else:
                self.params = replicate(self.params, mesh)
            if self._zero1:
                # allocate the moments DIRECTLY in their sharded layout:
                # an eager init would materialize the full replicated state
                # on every chip first — exactly the memory zero1 is meant
                # to never allocate (flagship moments: 5.4 GB bf16/chip)
                from trustedai_cl_vae_ad_tpu.parallel.zero import zero1_shardings

                abstract = jax.eval_shape(self.optimizer.init, self.params)
                osh = zero1_shardings(abstract, mesh)
                self.opt_state = jax.jit(
                    self.optimizer.init, out_shardings=osh
                )(self.params)
            elif multiproc:
                # eager init would compute on non-addressable global arrays;
                # jit with replicated outputs is the multi-controller path
                self.opt_state = jax.jit(
                    self.optimizer.init, out_shardings=replicated_sharding(mesh)
                )(self.params)
            else:
                self.opt_state = replicate(self.optimizer.init(self.params), mesh)
        else:
            self.opt_state = self.optimizer.init(self.params)
        self._build_train_jits()

    def place_on_mesh(self, mesh) -> None:
        """Move an already-compiled model onto a device mesh WITHOUT touching
        its state (places params and the existing optimizer moments, then
        rebuilds the sharded train step). Used when resuming a checkpoint into
        a data-parallel run: a fresh compile(mesh=...) would re-init Adam.

        Honors ``training.zero1``: restored moments land in their sharded
        layout instead of silently replicating the full state per chip."""
        from trustedai_cl_vae_ad_tpu.parallel.mesh import (
            replicate,
            replicated_from_local,
        )

        self.mesh = mesh
        self._zero1 = bool(self.config.get("training", {}).get("zero1", False))
        multiproc = jax.process_count() > 1
        if multiproc:
            self.params = replicated_from_local(jax.device_get(self.params), mesh)
            if self.opt_state is not None:
                state_rep = replicated_from_local(
                    jax.device_get(self.opt_state), mesh)
                if self._zero1:
                    # re-shard the replicated restore into the zero1 layout
                    # (a jit reshard — GSPMD emits the slice per process)
                    from trustedai_cl_vae_ad_tpu.parallel.zero import zero1_shardings

                    osh = zero1_shardings(state_rep, mesh)
                    state_rep = jax.jit(lambda t: t, out_shardings=osh)(state_rep)
                self.opt_state = state_rep
        else:
            self.params = replicate(self.params, mesh)
            if self.opt_state is not None:
                if self._zero1:
                    from trustedai_cl_vae_ad_tpu.parallel.zero import place_zero1

                    self.opt_state = place_zero1(self.opt_state, mesh)
                else:
                    self.opt_state = replicate(self.opt_state, mesh)
        if self.optimizer is not None:
            self._build_train_jits()

    # -- rng ----------------------------------------------------------------------
    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- jit construction ----------------------------------------------------------
    def _build_jitted(self):
        core = self.core

        self._encode_j = jax.jit(lambda p, x: core.encode(p, x))
        # training=True adds N(0, beta) input fuzz (abstract_cvae.py:115-118);
        # beta is traced so re-dialing it never recompiles
        self._encode_train_j = jax.jit(
            lambda p, x, rng, beta: core.encode(p, x, training=True, rng=rng, beta=beta)
        )
        self._decode_sig_j = jax.jit(lambda p, z: core.decode(p, z, apply_sigmoid=True))
        self._decode_raw_j = jax.jit(lambda p, z: core.decode(p, z, apply_sigmoid=False))
        self._call_j = jax.jit(
            lambda p, x, rng, training: core.call(p, x, training=training, rng=rng),
            static_argnums=(3,),
        )
        self._call_detailed_j = jax.jit(
            lambda p, x, rng, training: core.call_detailed(p, x, training=training, rng=rng),
            static_argnums=(3,),
        )
        self._loss_j = jax.jit(
            lambda p, x, rng, training, return_inf: core.compute_loss(
                p, x, training=training, return_inf=return_inf, rng=rng
            ),
            static_argnums=(3, 4),
        )
        self._sample_j = jax.jit(lambda p, eps: core.decode(p, eps, apply_sigmoid=True))

    def _build_train_jits(self):
        core = self.core
        optimizer = self.optimizer

        if self.mesh is not None:
            from trustedai_cl_vae_ad_tpu.parallel.dp import build_train_step

            if int((self.config.get("training") or {}).get("loss_chunks", 0) or 0) > 1:
                print(
                    "WARNING: training.loss_chunks is not supported on the "
                    "data-parallel path (chunk slicing would reshard the "
                    "batch-sharded axis); using the full-batch loss. The "
                    "per-chip batch is already 1/N of global — shrink the "
                    "batch or run single-device if chunking is required."
                )
            osh = None
            if getattr(self, "_zero1", False):
                from trustedai_cl_vae_ad_tpu.parallel.zero import zero1_shardings

                osh = zero1_shardings(self.opt_state, self.mesh)
            self._train_step_j = build_train_step(core, optimizer, self.mesh,
                                                  opt_state_shardings=osh)
            if jax.process_count() > 1:
                # multi-host eval: the plain _loss_j jit can't consume
                # non-addressable global params — build a sharded eval loss
                # (rng-free: eval-mode reparameterize uses zero eps)
                from trustedai_cl_vae_ad_tpu.parallel.mesh import (
                    batch_sharding,
                    replicated_sharding,
                )

                rep = replicated_sharding(self.mesh)
                bsh = batch_sharding(self.mesh)
                self._eval_loss_sharded_j = jax.jit(
                    lambda p, x: core.compute_loss(p, x, training=False),
                    in_shardings=(rep, bsh), out_shardings=rep,
                )
            return

        # training.loss_chunks > 1 evaluates the image-space loss reductions
        # in sequential batch slices so no full-resolution f32 tensor is ever
        # materialized (breaks the XLA 2 GiB buffer limit at flagship batch
        # >= 896 — BENCH_NOTES.md). Identical math (tests/test_losses.py).
        loss_chunks = int((self.config.get("training") or {}).get("loss_chunks", 0) or 0)
        if loss_chunks > 1 and not hasattr(core, "compute_loss_chunked"):
            print(
                f"WARNING: training.loss_chunks={loss_chunks} ignored — "
                f"{type(core).__name__} has no chunked loss; the full-batch "
                "path (full-resolution f32 loss tensors) will be used."
            )
            loss_chunks = 0

        def train_step(params, opt_state, x, rng):
            def loss_fn(p):
                if loss_chunks > 1 and x.shape[0] % loss_chunks == 0:
                    loss_dict, x_hat = core.compute_loss_chunked(
                        p, x, loss_chunks, training=True, return_inf=True, rng=rng
                    )
                else:
                    if loss_chunks > 1:
                        # trace-time (once per shape): the ragged tail batch
                        # falls back to the unchunked loss — fine at small
                        # sizes, but not what the knob was set for
                        print(
                            f"WARNING: batch {x.shape[0]} not divisible by "
                            f"loss_chunks={loss_chunks}; using the unchunked "
                            "loss for this batch shape."
                        )
                    loss_dict, x_hat = core.compute_loss(p, x, training=True, return_inf=True, rng=rng)
                return loss_dict["loss"], (loss_dict, x_hat)

            grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_dict, x_hat

        from trustedai_cl_vae_ad_tpu.utils.compile import optioned_jit

        # honors TCVAE_COMPILER_OPTIONS / training.compiler_options (measured
        # +5.4% on the flagship step — utils/compile.py); plain jit otherwise
        self._train_step_j = optioned_jit(train_step, donate_argnums=(0, 1))

    # -- reference API surface (abstract_cvae.py:109-178) --------------------------
    def encode(self, x, training: bool = False):
        """Split encoder output into (mean, logvar) (abstract_cvae.py:115-122).

        With ``training=True`` the input is fuzzed with N(0, beta) noise
        exactly as the reference's encode does — previously this argument was
        silently dropped, diverging for src/ shim users (ADVICE round 1).
        """
        x = _as_image_input(x)
        if training:
            return self._encode_train_j(self.params, x, self._next_rng(), self._beta)
        return self._encode_j(self.params, x)

    def reparameterize(self, mean, logvar, training: bool = False):
        rng = self._next_rng() if training else None
        return self.core.reparameterize(mean, logvar, training=training, rng=rng)

    def decode(self, z, apply_sigmoid: bool = False):
        z = jnp.asarray(z, jnp.float32)
        if apply_sigmoid:
            return self._decode_sig_j(self.params, z)
        return self._decode_raw_j(self.params, z)

    def sample(self, eps=None, n: int = 100):
        if eps is None:
            eps = jax.random.normal(self._next_rng(), (n, self.latent_size))
        return self._sample_j(self.params, jnp.asarray(eps, jnp.float32))

    def call(self, x, training: bool = False):
        x = _as_image_input(x)
        rng = self._next_rng()
        return self._call_j(self.params, x, rng, training)

    def __call__(self, x, training: bool = False):
        return self.call(x, training)

    def call_detailed(self, x, training: bool = False):
        x = _as_image_input(x)
        rng = self._next_rng()
        return self._call_detailed_j(self.params, x, rng, training)

    def compute_loss(self, x, training: bool = False, return_inf: bool = False):
        x = _as_image_input(x)
        rng = self._next_rng()
        return self._loss_j(self.params, x, rng, training, return_inf)

    def train_step(self, x):
        """One gradient step; returns the loss dict (abstract_cvae.py:154-162)."""
        loss, _ = self.train_step_and_run(x)
        return loss

    def test_step(self, x):
        if self.mesh is not None and jax.process_count() > 1:
            from trustedai_cl_vae_ad_tpu.parallel.mesh import global_batch_from_local

            xh = np.asarray(x)
            xg = global_batch_from_local(
                xh if xh.dtype == np.uint8 else xh.astype(np.float32, copy=False),
                self.mesh,
            )
            return self._eval_loss_sharded_j(self.params, xg)
        return self.compute_loss(x, training=False)

    def train_step_and_run(self, x):
        """Gradient step returning (loss dict, x_hat) (abstract_cvae.py:170-178)."""
        assert self.optimizer is not None, "call model.compile() before training"
        if self.mesh is not None:
            from trustedai_cl_vae_ad_tpu.parallel.mesh import (
                DATA_AXIS,
                batch_sharding,
                global_batch_from_local,
                shard_batch,
            )

            if jax.process_count() > 1:
                # multi-host: the caller's batch is this HOST's shard of the
                # global batch (per-host ingest); every process contributes
                # its rows. No ragged padding here — per-host batches must
                # divide the local device count.
                xh = np.asarray(x)
                x = global_batch_from_local(
                    xh if xh.dtype == np.uint8 else xh.astype(np.float32, copy=False),
                    self.mesh,
                )
            elif isinstance(x, jax.Array) and x.shape[0] % self.mesh.shape[DATA_AXIS] == 0:
                # already device-resident (ingest pipeline): reshard
                # device-to-device — no host round-trip per batch. uint8
                # stays uint8 (4x less ICI/HBM traffic); the loss normalizes
                # on device (models/cvae.normalize_image_input).
                x = jax.device_put(
                    x if x.dtype == jnp.uint8 else x.astype(jnp.float32),
                    batch_sharding(self.mesh),
                )
            else:
                xh = np.asarray(x)
                x = shard_batch(
                    xh if xh.dtype == np.uint8 else xh.astype(np.float32, copy=False),
                    self.mesh,
                )
        else:
            # uint8 batches ship raw and normalize inside the jitted step
            # (4x smaller transfer; the chunked loss keeps them uint8 in HBM
            # and the unchunked loss fuses the /255 into the first conv —
            # every path now agrees uint8 means raw 0-255 pixels)
            x = _as_image_input(x)
        rng = self._next_rng()
        from trustedai_cl_vae_ad_tpu.utils.profiling import defer_signals

        # the step donates (params, opt_state): a KeyboardInterrupt delivered
        # between donation and this re-assignment would leave the model
        # holding deleted buffers (and the rescue save crashing) — defer
        # signal delivery past the assignment
        with defer_signals():
            self.params, self.opt_state, loss, x_hat = self._train_step_j(
                self.params, self.opt_state, x, rng
            )
        return loss, x_hat

    # -- checkpointing (ABI: log dir with encoder/ decoder/ config.yml) ------------
    def save_model(self, log_dir: str, include_optimizer: bool = True,
                   saver=None) -> None:
        """Checkpoint to ``log_dir``. With ``saver`` (an AsyncSaver) the disk
        write happens on a background thread — training may continue (and
        donate these buffers: the D2H copy is in the blocking portion) as
        soon as this returns. Multi-host saves stay on the synchronous path
        (orbax's cross-process barrier protocol is validated there)."""
        from trustedai_cl_vae_ad_tpu.train.checkpoint import save_checkpoint

        params, opt_state = self.params, self.opt_state if include_optimizer else None
        if self.mesh is not None and jax.process_count() > 1:
            # multi-host: fetch each host's (identical) replica to host
            # memory, then let orbax's own multihost protocol coordinate the
            # write — EVERY process must call save (orbax runs cross-process
            # barriers internally; a primary-only call deadlocks the job).
            # The checkpoint is byte-identical to a single-host save.
            # ZeRO-1-sharded moment leaves have no full local replica: a
            # per-leaf resharding jit all-gathers them first (a transient
            # leaf-sized replication per chip during the save — bounded by
            # gathering one leaf at a time). Every process must walk the
            # same leaf sequence: tree_map order is deterministic.
            from trustedai_cl_vae_ad_tpu.parallel.mesh import replicated_sharding

            rep = replicated_sharding(self.mesh)

            def _fetch(a):
                if not isinstance(a, jax.Array):
                    return a
                if not a.is_fully_replicated:
                    a = jax.jit(lambda x: x, out_shardings=rep)(a)
                return np.asarray(a.addressable_data(0))

            def _local(tree):
                return jax.tree_util.tree_map(_fetch, tree)

            params = _local(params)
            if opt_state is not None:
                opt_state = _local(opt_state)
        if saver is not None and jax.process_count() == 1:
            saver.save(log_dir, params, opt_state=opt_state)
            return
        save_checkpoint(log_dir, params, opt_state=opt_state)

    def load_model(self, model_path: str, restore_optimizer: Optional[bool] = None) -> None:
        """Restore weights (+ optimizer state if present) from a log dir.

        Mirrors abstract_cvae.py:95-106. Unlike the reference (which discards
        optimizer state and swaps whole Keras submodels), this restores params
        in place and can restore Adam moments too — fixing the reference's
        checkpoint gap (SURVEY.md section 5.4).

        ``restore_optimizer``:
          * None (default): restore moments only if the model is already
            compiled — inference-only tools never allocate Adam state
            (flagship moments are ~8 GB);
          * True: compile if needed and restore moments (training/CL resume);
          * False: params only.
        """
        import os as _os

        from trustedai_cl_vae_ad_tpu.train.checkpoint import (
            resolve_round_dir,
            restore_checkpoint,
        )

        # resolve the round layout (not the ABI symlink: a logdir whose
        # commit died before the stable symlinks ever existed still has its
        # optimizer inside the newest complete round)
        has_opt_ckpt = _os.path.exists(
            _os.path.join(resolve_round_dir(model_path), "optimizer"))
        if restore_optimizer is True and self.optimizer is None and has_opt_ckpt:
            self.compile()
        want_opt = restore_optimizer is not False and self.optimizer is not None
        params, opt_state = restore_checkpoint(
            model_path, self.params, self.opt_state if want_opt else None
        )
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state

    # -- numpy conveniences for the tool scripts -----------------------------------
    def predict(self, x) -> np.ndarray:
        # same input contract as call(): uint8 means raw 0-255 pixels and
        # normalizes on device — a pre-cast to f32 here would silently feed
        # 0-255 floats through the "already normalized" path
        return np.asarray(self.call(x))
