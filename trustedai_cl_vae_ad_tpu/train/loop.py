"""Offline training driver (library side of train.py).

Parity with reference train.py:95-193: build + compile the model, epoch loop
with per-epoch validation, per-epoch beta annealing (x0.98, train.py:40-47),
TensorBoard-equivalent metric logging, KeyboardInterrupt-safe checkpointing
(train.py:122-125), encoder/decoder checkpoint save (train.py:127-128), and
post-train evaluation artifacts (original/reconstruction grids + image and
latent histograms, train.py:135-193 — matplotlib instead of plotly).

TPU-first: the train step is a single jitted (optionally pjit-sharded) pure
function; batches stream through a device-prefetch queue so host decode
overlaps device compute.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
from trustedai_cl_vae_ad_tpu.data.loader import iter_images as _iter_images
from trustedai_cl_vae_ad_tpu.utils.metrics import MetricsWriter


class BetaAnnealing:
    """Per-epoch beta decay, reference train.py:40-47 (rate 0.98)."""

    def __init__(self, rate: float = 0.98):
        self.rate = rate

    def on_epoch_end(self, model: VAEModel) -> None:
        model.beta = model.beta * self.rate


def lr_schedule_fn(config: dict):
    """``training.lr_schedule`` -> ``lr(epoch)`` callable, or None (constant).

    The reference DEFINES a per-epoch learning-rate schedule (train.py:33-37:
    hold the base lr for 10 epochs, then multiply by exp(-0.1) each epoch)
    but never registers it with the callback list (train.py:116-120) — dead
    code. Here it ships as a working opt-in knob, the same pattern as the
    post-``exit()`` anomaly dumps. The returned schedule is a pure function
    of (base lr, epoch index), so ``--resume`` recomputes the correct value
    for the resumed epoch with no extra sidecar state, and each epoch's value
    lands through the injected-hyperparam dial (no recompilation —
    models/wrapper.py set_learning_rate, the mechanism the CL stream uses).

    Accepted specs (``training.lr_schedule``):
      - ``"reference"`` / ``"exponential"``: the reference's schedule;
        optional dict form tunes ``hold_epochs`` (default 10) and ``decay``
        (default 0.1): lr(e) = base * exp(-decay * max(0, e - hold + 1)).
      - ``{"type": "cosine", "decay_epochs": N, "min_fraction": f}``: cosine
        from base to f*base over N epochs (default N = max_epochs, f = 0).
    """
    import math

    spec = (config.get("training") or {}).get("lr_schedule")
    if not spec:
        return None
    base = float(config["training"]["learning_rate"])
    if isinstance(spec, str):
        spec = {"type": spec}
    if not isinstance(spec, dict) or "type" not in spec:
        raise ValueError(
            "training.lr_schedule must be a schedule name or a dict with a "
            f"'type' key, got: {spec!r}")
    kind = str(spec["type"]).lower()
    if kind in ("reference", "exponential"):
        hold = int(spec.get("hold_epochs", 10))
        decay = float(spec.get("decay", 0.1))
        return lambda e: base * math.exp(-decay * max(0, int(e) - hold + 1))
    if kind == "cosine":
        total = int(spec.get("decay_epochs",
                             config["training"]["max_epochs"]))
        lo = float(spec.get("min_fraction", 0.0))

        def _cosine(e: int) -> float:
            t = min(max(int(e), 0), total) / max(total, 1)
            return base * (lo + (1.0 - lo) * 0.5 * (1.0 + math.cos(math.pi * t)))

        return _cosine
    raise ValueError(f"unknown training.lr_schedule type: {kind!r}")


# -- training-progress sidecar ------------------------------------------------
#
# The reference's checkpoint holds only weights; a resumed run restarts the
# epoch count and the beta-anneal schedule from the config values. We persist
# {epochs_completed, step, beta} next to the checkpoint so ``train.py
# --resume`` continues the run where it stopped: remaining epochs only, beta
# at its annealed value, metric steps numbered continuously (TB curves join).

TRAIN_STATE_FILE = "train_state.json"


class _NullWriter:
    """Metrics sink for non-primary multi-host processes."""

    def log(self, *a, **k):
        pass

    def close(self):
        pass


def save_train_state(logdir: str, epochs_completed: int, step: int, beta: float) -> None:
    import json

    path = os.path.join(logdir, TRAIN_STATE_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"epochs_completed": int(epochs_completed), "step": int(step),
             "beta": float(beta)}, f)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts the state


def load_train_state(logdir: str) -> Optional[dict]:
    """Progress sidecar from a previous run, or None (pre-feature log dirs)."""
    import json

    path = os.path.join(logdir, TRAIN_STATE_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        state = json.load(f)
    return {"epochs_completed": int(state.get("epochs_completed", 0)),
            "step": int(state.get("step", 0)),
            "beta": float(state["beta"]) if "beta" in state else None}


def train_model(
    config: dict,
    model: VAEModel,
    data: dict,
    writer: Optional[MetricsWriter] = None,
    beta_annealing: Optional[BetaAnnealing] = None,
    max_epochs: Optional[int] = None,
    log_every: int = 50,
    parallel: bool = True,
    initial_epoch: int = 0,
    initial_step: int = 0,
) -> VAEModel:
    """Epoch loop over data['train'] with validation on data['val'].

    ``initial_epoch``/``initial_step`` continue a resumed run (train.py
    --resume reads them from the previous log dir's train_state.json):
    ``max_epochs`` stays the TOTAL target, so a run resumed after k epochs
    trains ``max_epochs - k`` more.
    """
    logdir = config.get("logdir", ".")
    epochs = int(max_epochs if max_epochs is not None else config["training"]["max_epochs"])
    if beta_annealing is None:
        beta_annealing = BetaAnnealing()
    # multi-host: every process trains (collective steps), but exactly one
    # writes metrics + the schedule sidecar (interleaved JSONL writers would
    # corrupt the file); save_model itself gathers to process 0
    primary = jax.process_index() == 0
    owns_writer = writer is None
    if writer is None:
        writer = MetricsWriter(logdir) if primary else _NullWriter()

    mesh = None
    if parallel and (len(jax.local_devices()) > 1 or jax.process_count() > 1):
        # multi-host: even one local device per host needs the global mesh —
        # without it each process would train an independent model
        from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if model.optimizer is None:
        model.compile(mesh=mesh)
    elif mesh is not None and model.mesh is None:
        # resumed/pre-compiled model joining a data-parallel run: replicate
        # its existing state (a fresh compile would wipe restored Adam moments)
        model.place_on_mesh(mesh)

    step = int(initial_step)
    # Interrupt-safe stop handling. Two requirements meet here:
    # (a) SIGTERM (TPU preemption, container eviction, `timeout`) kills
    #     Python WITHOUT running finally blocks, so the save-on-interrupt
    #     path below would never fire on the most common production stop
    #     signal;
    # (b) the train step DONATES (params, opt_state): an exception raised
    #     mid-dispatch leaves the model referencing deleted device buffers,
    #     and the rescue save then dies with "Array has been deleted" —
    #     so neither SIGTERM nor Ctrl-C may raise inside the step.
    # The handler therefore only RECORDS the stop request; the epoch loop
    # raises KeyboardInterrupt at the next batch boundary, where the state
    # is whole. A second signal escalates to an immediate raise (the step
    # in flight is then lost, deliberately). Handlers can only be installed
    # from the main thread — elsewhere (e.g. a test harness thread)
    # training proceeds with stock delivery.
    import signal
    import threading

    _stop = {"n": 0}

    def _request_stop(_sig, _frm):
        _stop["n"] += 1
        if _stop["n"] >= 2:
            raise KeyboardInterrupt

    _prev_handlers = []
    if threading.current_thread() is threading.main_thread():
        for _s in (signal.SIGTERM, signal.SIGINT):
            _prev_handlers.append((_s, signal.getsignal(_s)))
            signal.signal(_s, _request_stop)
    # (epochs_completed, beta-at-that-boundary) updated in ONE tuple
    # assignment after each anneal: an interrupt can land between
    # on_epoch_end (which mutates model.beta) and the bookkeeping, and saving
    # the LIVE beta there would record an annealed beta with the epoch marked
    # incomplete — resume would then re-run the epoch and anneal TWICE.
    # Saving this snapshot keeps (count, beta) mutually consistent: either
    # the pre-anneal pair (epoch re-runs, anneals once) or the post pair.
    progress = (int(initial_epoch), float(model.beta))
    # training.checkpoint_every_epochs (default 0 = off): periodic mid-run
    # checkpoints. The interrupt/exception save below covers SIGTERM and
    # Python-visible failures, but SIGKILL (OOM killer, lost node, hard
    # preemption) runs nothing — a long run would lose everything. Each
    # periodic save writes the same logdir checkpoint + sidecar a final save
    # would, so --resume works from the last completed period.
    ckpt_every = int((config.get("training") or {}).get("checkpoint_every_epochs", 0) or 0)
    # training.async_checkpoint (opt-in): periodic saves return after the
    # device->host copy and write to disk on a background thread — the loop
    # keeps training (donating the saved buffers is safe: the copy is in the
    # blocking portion). The sidecar write becomes a commit callback so it
    # still lands only AFTER the weights do. Multi-host runs stay on the
    # synchronous path (orbax's cross-process barriers are validated there).
    async_saver = None
    if (config.get("training") or {}).get("async_checkpoint"):
        if jax.process_count() > 1:
            print("WARNING: training.async_checkpoint ignored on multi-host "
                  "runs (synchronous orbax barrier protocol used instead)")
        else:
            from trustedai_cl_vae_ad_tpu.train.checkpoint import AsyncSaver

            async_saver = AsyncSaver()
    # training.lr_schedule (opt-in; the reference's schedule is defined but
    # never wired — train.py:33-37 vs :116-120). lr(epoch) is pure, so a
    # resumed run re-dials the correct value for initial_epoch automatically.
    lr_sched = lr_schedule_fn(config)
    try:
        for epoch in range(int(initial_epoch), epochs):
            if lr_sched is not None:
                model.set_learning_rate(lr_sched(epoch))
            for batch in _iter_images(data["train"]):
                loss = model.train_step(batch)
                if step % log_every == 0:
                    writer.log(step, jax.device_get(loss), prefix="train/")
                step += 1
                if _stop["n"]:  # deferred SIGTERM/SIGINT: state is whole here
                    raise KeyboardInterrupt
            # Validation pass
            if data.get("val") is not None:
                val_losses = []
                for batch in _iter_images(data["val"]):
                    val_losses.append(jax.device_get(model.test_step(batch)))
                    if _stop["n"]:
                        raise KeyboardInterrupt
                if val_losses:
                    mean_val = {
                        k: float(np.mean([d[k] for d in val_losses])) for k in val_losses[0]
                    }
                    writer.log(step, mean_val, prefix="val/")
            beta_annealing.on_epoch_end(model)
            progress = (epoch + 1, float(model.beta))
            epoch_log = {"beta": model.beta, "epoch": epoch}
            if lr_sched is not None:
                epoch_log["learning_rate"] = model.learning_rate
            writer.log(step, epoch_log, prefix="train/")
            if ckpt_every and (epoch + 1) % ckpt_every == 0 and (epoch + 1) < epochs:
                # sidecar only after the weights land (mutual consistency, as
                # in the final save); a failed periodic save aborts the run
                # through the exception path, which itself retries a save
                if async_saver is not None:
                    model.save_model(logdir, saver=async_saver)
                    if primary:
                        # bind THIS round's values; runs when the round commits
                        async_saver.add_commit_callback(
                            lambda e=progress[0], s=step, b=progress[1]:
                            save_train_state(logdir, e, s, b))
                else:
                    model.save_model(logdir)
                    if primary:
                        save_train_state(logdir, progress[0], step, progress[1])
            if _stop["n"]:  # signal landed during val/anneal/periodic save
                raise KeyboardInterrupt
    except KeyboardInterrupt:
        print("Keyboard Interrupt")  # parity: train.py:124-125 saves on Ctrl-C
    finally:
        # any mid-epoch failure (OOM, corrupt frame, device error) still
        # checkpoints the progress and flushes buffered metrics — the Ctrl-C
        # path saved while an exception path silently lost both. A mid-epoch
        # stop counts that epoch as NOT completed (resume re-runs it) and
        # saves the last epoch BOUNDARY's beta (beta only changes at epoch
        # end, so the model never trained on a newer value).
        # the sidecar is written only AFTER a successful weight save (they
        # must stay mutually consistent: a sidecar recording progress the
        # saved weights never trained would make --resume skip epochs), but
        # the metrics writer closes regardless — a checkpoint save that
        # times out (e.g. saving FROM a TPU through a flaky tunnel) must not
        # also drop every buffered metric since the last flush
        try:
            if async_saver is not None:
                # drain the in-flight periodic write (and its sidecar commit)
                # before the final synchronous save stages the next round. A
                # FAILED background write (disk full, transient I/O) must not
                # skip the final save below — that round never committed, so
                # a fresh synchronous save still leaves a consistent logdir
                try:
                    async_saver.wait()
                except Exception as e:  # noqa: BLE001 — orbax raises bare errors
                    print("WARNING: async periodic checkpoint failed "
                          f"({e}); writing a final synchronous save")
            model.save_model(logdir)
            if primary:
                save_train_state(logdir, progress[0], step, progress[1])
        finally:
            if async_saver is not None:
                try:
                    async_saver.close()
                except Exception as e:  # never mask the primary failure
                    print(f"WARNING: async checkpointer close failed: {e}")
            for _s, _h in _prev_handlers:
                # restore whatever handler the caller had (SIG_DFL if the
                # previous one came from C and is unrepresentable)
                signal.signal(_s, _h if _h is not None else signal.SIG_DFL)
            if owns_writer:
                writer.close()
    return model


def evaluate(config: dict, model: VAEModel, data: dict, n: int = 10) -> None:
    """Post-training artifacts. Parity with reference train.py:135-193:
    original.png / reconstruction.png facet grids (matplotlib in place of
    plotly), output_histogram.png, latent_histogram.png."""
    from trustedai_cl_vae_ad_tpu.viz.plots import histogram, image_grid

    logdir = config["logdir"]

    xs = []
    for batch in _iter_images(data["val"] if data.get("val") is not None else data["train"]):
        xs.append(np.asarray(batch))
        if sum(b.shape[0] for b in xs) >= n:
            break
    if not xs:
        print("evaluate: no validation data")
        return
    x_i = np.concatenate(xs, axis=0)[:n]
    if x_i.dtype == np.uint8:
        # the uint8 contract (raw 0-255 pixels) — load_data streams arrive
        # f32-normalized, but train_model/evaluate accept any batch source,
        # and the figures below assume [0, 1] pixel values
        x_i = x_i.astype(np.float32) / 255.0

    y = np.asarray(model.call(jnp.asarray(x_i, jnp.float32)))
    mean, _ = model.encode(jnp.asarray(x_i, jnp.float32))
    z = np.asarray(mean)

    y_rng = np.max(y) - np.min(y)
    y_i = (y - np.min(y)) / (y_rng if y_rng > 0 else 1.0)

    image_grid(x_i, os.path.join(logdir, "original.png"), "Original")
    image_grid(y_i, os.path.join(logdir, "reconstruction.png"), "Reconstruction")

    histogram(
        os.path.join(logdir, "output_histogram.png"),
        {"Original": x_i, "Reconstruction": y_i},
        "Flat Image Histogram",
        bins=64,
    )
    histogram(
        os.path.join(logdir, "latent_histogram.png"),
        {"latent": z},
        "Latent Vector Histogram",
        bins=64,
    )
