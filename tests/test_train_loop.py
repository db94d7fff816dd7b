"""Training loop: beta annealing, epoch flow, evaluation artifacts, metrics."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def loop_setup(tmp_path):
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3], "n_train": 16, "n_val": 8},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1.0, "learning_rate": 1e-3, "max_epochs": 2},
        "logdir": str(tmp_path / "run"),
    }
    os.makedirs(config["logdir"])
    model = load_model_from_config(config)
    data = load_data(config)
    return config, model, data


def test_train_model_end_to_end(loop_setup):
    from trustedai_cl_vae_ad_tpu.train.loop import train_model

    config, model, data = loop_setup
    model = train_model(config, model, data, parallel=False, log_every=1)
    # beta annealed x0.98 per epoch (reference train.py:40-47), 2 epochs
    np.testing.assert_allclose(model.beta, 1.0 * 0.98**2, rtol=1e-6)
    # checkpoint written
    assert os.path.isdir(os.path.join(config["logdir"], "encoder"))
    assert os.path.isdir(os.path.join(config["logdir"], "optimizer"))
    # metrics logged with train/ and val/ prefixes
    lines = [json.loads(l) for l in open(os.path.join(config["logdir"], "metrics.jsonl"))]
    keys = set().union(*(l.keys() for l in lines))
    assert any(k.startswith("train/loss") for k in keys)
    assert any(k.startswith("val/loss") for k in keys)
    assert "train/beta" in keys


def test_evaluate_artifacts(loop_setup):
    from trustedai_cl_vae_ad_tpu.train.loop import evaluate

    config, model, data = loop_setup
    evaluate(config, model, data, n=4)
    for name in ("original.png", "reconstruction.png", "output_histogram.png",
                 "latent_histogram.png"):
        p = os.path.join(config["logdir"], name)
        assert os.path.exists(p) and os.path.getsize(p) > 0, name


def test_periodic_checkpointing(tmp_path, monkeypatch):
    """training.checkpoint_every_epochs writes a full resume point (weights +
    sidecar) at each period boundary, so SIGKILL/OOM (which runs no Python
    cleanup) loses at most one period of work; the final epoch's save is the
    normal end-of-run save, not a duplicate."""
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train import loop as loop_mod

    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3], "n_train": 16, "n_val": 8},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1.0, "learning_rate": 1e-3,
                     "max_epochs": 4, "checkpoint_every_epochs": 2},
        "logdir": str(tmp_path / "run"),
    }
    os.makedirs(config["logdir"])
    model = load_model_from_config(config)

    sidecars = []
    real_save = loop_mod.save_train_state

    def spy(logdir, epochs_completed, step, beta):
        sidecars.append((epochs_completed, step, beta))
        return real_save(logdir, epochs_completed, step, beta)

    monkeypatch.setattr(loop_mod, "save_train_state", spy)
    loop_mod.train_model(config, model, load_data(config), parallel=False)
    # one periodic save at epoch 2 + the end-of-run save at epoch 4
    assert [s[0] for s in sidecars] == [2, 4], sidecars
    np.testing.assert_allclose(sidecars[0][2], 0.98**2, rtol=1e-6)
    # the weights landed with the periodic sidecar (resume point is complete)
    assert os.path.isdir(os.path.join(config["logdir"], "encoder"))
    assert os.path.isdir(os.path.join(config["logdir"], "optimizer"))


def test_sigterm_saves_checkpoint(tmp_path):
    """SIGTERM (TPU preemption / container stop / `timeout`) kills Python
    without running finally blocks; train_model converts it to the
    KeyboardInterrupt save path, so a preempted run still checkpoints weights
    and the schedule sidecar (review r4)."""
    import signal
    import subprocess
    import sys
    import time

    logdir = tmp_path / "run"
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import os
from trustedai_cl_vae_ad_tpu.data.loader import load_data
from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
from trustedai_cl_vae_ad_tpu.train.loop import train_model

config = {{
    "data": {{"dataset": "synthetic", "image_size": [16, 16, 3],
              "n_train": 64, "n_val": 8}},
    "loss": {{"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
              "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0}},
    "model": {{"type": "KurtosisSingle", "decoder_dense_filters": 4,
               "latent_dimensions": 8, "layers": [4]}},
    "training": {{"batch_size": 8, "beta": 1.0, "learning_rate": 1e-3,
                  "max_epochs": 100000}},
    "logdir": {str(logdir)!r},
}}
os.makedirs(config["logdir"])
model = load_model_from_config(config)
train_model(config, model, load_data(config), parallel=False, log_every=1)
print("SAVED_AND_EXITED")
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until training has demonstrably started (metrics flushed per
        # step with log_every=1), then deliver the supervisor stop signal
        metrics = os.path.join(str(logdir), "metrics.jsonl")
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(metrics) and os.path.getsize(metrics) > 0:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        assert proc.poll() is None, f"trainer exited early:\n{proc.stdout.read()}"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert "SAVED_AND_EXITED" in out, f"no clean save on SIGTERM:\n{out}"
    assert os.path.isdir(os.path.join(str(logdir), "encoder"))
    assert os.path.isdir(os.path.join(str(logdir), "decoder"))
    assert os.path.exists(os.path.join(str(logdir), "train_state.json"))


def test_evaluate_uint8_batches_normalize(loop_setup):
    """evaluate() honors the uint8 contract on a user-supplied batch source
    (raw 0-255 pixels normalize before the forward and the figures): the
    reconstructions/histograms must match the f32/255 twin's (review r4)."""
    from trustedai_cl_vae_ad_tpu.train.loop import evaluate

    config, model, data = loop_setup
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    evaluate(config, model, {"train": [u8], "val": None}, n=4)
    rec_u8 = open(os.path.join(config["logdir"], "reconstruction.png"), "rb").read()
    evaluate(config, model, {"train": [u8.astype(np.float32) / 255.0], "val": None}, n=4)
    rec_f32 = open(os.path.join(config["logdir"], "reconstruction.png"), "rb").read()
    assert rec_u8 == rec_f32


def test_autosave_flow(tmp_path):
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = {
        "data": {"image_size": [8, 8, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 2,
                  "latent_dimensions": 4, "layers": [2]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    model = load_model_from_config(config)
    model.compile()
    cache = tmp_path / "cache"
    eng = StreamingEngine(
        model, config, model_cache_dir=str(cache), autosave_period_s=0.0
    )
    eng.inference_period_ms = 0.0
    eng.continuous_learning_period_ms = 0.0
    eng.enable_cont_learning = True  # CL marks the model dirty
    frame = np.random.RandomState(0).randint(0, 255, (8, 8, 3), np.uint8)
    eng.process_frame(frame)
    eng._last_autosave_t = -1e9
    eng.process_frame(frame)  # autosave fires here (dirty + period elapsed)
    assert os.path.isdir(cache / "encoder")
    assert not eng.model_changed_flag


def test_train_state_sidecar_written(loop_setup):
    from trustedai_cl_vae_ad_tpu.train.loop import load_train_state, train_model

    config, model, data = loop_setup
    train_model(config, model, data, parallel=False)
    state = load_train_state(config["logdir"])
    assert state == {"epochs_completed": 2,
                     "step": state["step"],
                     "beta": pytest.approx(1.0 * 0.98**2, rel=1e-6)}
    assert state["step"] == 2 * (16 // 8)  # 2 epochs x 2 batches


def test_resume_continues_schedule(loop_setup, tmp_path):
    """Resume trains only the remaining epochs, continues the beta anneal and
    the metric step numbering (the reference restarts all three)."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.loop import load_train_state, train_model

    config, model, data = loop_setup
    train_model(config, model, data, parallel=False)  # 2 of 4 total epochs
    state = load_train_state(config["logdir"])

    resumed = load_model_from_config(config)
    resumed.compile()
    resumed.load_model(config["logdir"], restore_optimizer=True)
    resumed.beta = state["beta"]
    config2 = dict(config)
    config2["training"] = dict(config["training"], max_epochs=4)
    config2["logdir"] = str(tmp_path / "resumed")
    os.makedirs(config2["logdir"])
    train_model(config2, resumed, data, parallel=False, log_every=1,
                initial_epoch=state["epochs_completed"], initial_step=state["step"])

    # 2 more epochs only; beta anneal continued across the restart
    np.testing.assert_allclose(resumed.beta, 1.0 * 0.98**4, rtol=1e-6)
    new_state = load_train_state(config2["logdir"])
    assert new_state["epochs_completed"] == 4
    assert new_state["step"] == state["step"] + 2 * (16 // 8)
    # metric steps continue from the previous run's counter
    lines = [json.loads(l) for l in open(os.path.join(config2["logdir"], "metrics.jsonl"))]
    assert min(l["step"] for l in lines) >= state["step"]


def test_resume_cli_flow(loop_setup, tmp_path, monkeypatch, capsys):
    """train.py --resume picks up train_state.json end-to-end."""
    import sys

    import train as train_cli
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.train.loop import train_model

    config, model, data = loop_setup
    train_model(config, model, data, parallel=False)  # writes the sidecar

    cfg_path = tmp_path / "config.yml"
    save_config({k: v for k, v in config.items() if k != "logdir"}, str(cfg_path))
    monkeypatch.chdir(tmp_path)  # stamp_logdir writes ./logs here
    monkeypatch.setattr(sys, "argv",
                        ["train.py", str(cfg_path), "--resume", config["logdir"],
                         "--dry-run", "--no-parallel"])
    train_cli.main()
    out = capsys.readouterr().out
    assert "Resume state: 2 epochs done" in out
    assert "training 0 more" in out


def test_midtrain_exception_still_checkpoints(tmp_path):
    """A mid-epoch failure checkpoints progress and flushes metrics like the
    Ctrl-C path does (train_model's finally block)."""
    import os

    import pytest

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.loop import train_model

    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3],
                 "n_train": 8, "n_val": 4},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
        "logdir": str(tmp_path),
    }
    model = load_model_from_config(config)

    def exploding_batches():
        yield np.random.RandomState(0).random((4, 16, 16, 3)).astype(np.float32)
        raise RuntimeError("corrupt frame")

    with pytest.raises(RuntimeError, match="corrupt frame"):
        train_model(config, model, {"train": exploding_batches(), "val": None},
                    parallel=False)
    assert os.path.isdir(os.path.join(str(tmp_path), "encoder"))
    # the interrupted epoch counts as NOT completed (resume re-runs it), but
    # the step counter keeps the finished batch
    from trustedai_cl_vae_ad_tpu.train.loop import load_train_state

    state = load_train_state(str(tmp_path))
    assert state["epochs_completed"] == 0 and state["step"] == 1


def test_interrupt_during_anneal_saves_consistent_pair(tmp_path):
    """Regression: an interrupt landing AFTER beta_annealing.on_epoch_end
    mutated model.beta but BEFORE the epoch was counted used to save an
    ANNEALED beta with the epoch marked incomplete — resume then re-ran the
    epoch and annealed twice (final beta = config_beta * 0.98^(max_epochs+1)).
    The sidecar must hold a mutually consistent (epochs_completed, beta)
    snapshot: here, the PRE-anneal pair."""
    import os

    import pytest

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.loop import (
        BetaAnnealing, load_train_state, train_model)

    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3],
                 "n_train": 8, "n_val": 4},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
        "logdir": str(tmp_path),
    }
    model = load_model_from_config(config)
    beta0 = model.beta

    class InterruptedAnneal(BetaAnnealing):
        def on_epoch_end(self, m):
            super().on_epoch_end(m)  # beta already multiplied by 0.98 ...
            raise KeyboardInterrupt  # ... when the interrupt lands

    def batches():
        yield np.random.RandomState(0).random((4, 16, 16, 3)).astype(np.float32)

    train_model(config, model, {"train": batches(), "val": None},
                beta_annealing=InterruptedAnneal(), parallel=False)
    state = load_train_state(str(tmp_path))
    # epoch incomplete -> the saved beta must be the PRE-anneal value, so the
    # resumed re-run anneals exactly once
    assert state["epochs_completed"] == 0
    assert state["beta"] == pytest.approx(beta0)


def test_lr_schedule_fn_reference_semantics():
    """The reference's (dead) schedule, train.py:33-37: base lr for the first
    10 epochs, then x exp(-0.1) per epoch — Keras calls schedule(epoch, lr)
    at epoch START, so epoch 10 is the first decayed one."""
    import math

    from trustedai_cl_vae_ad_tpu.train.loop import lr_schedule_fn

    config = {"training": {"learning_rate": 1e-3, "max_epochs": 20,
                           "lr_schedule": "reference"}}
    sched = lr_schedule_fn(config)
    for e in range(10):
        assert sched(e) == pytest.approx(1e-3)
    assert sched(10) == pytest.approx(1e-3 * math.exp(-0.1))
    assert sched(15) == pytest.approx(1e-3 * math.exp(-0.6))

    # constant default: knob absent -> None (reference runtime behavior)
    assert lr_schedule_fn({"training": {"learning_rate": 1e-3}}) is None

    # cosine: base at 0, min_fraction*base at decay_epochs
    config["training"]["lr_schedule"] = {
        "type": "cosine", "decay_epochs": 8, "min_fraction": 0.1}
    cos = lr_schedule_fn(config)
    assert cos(0) == pytest.approx(1e-3)
    assert cos(4) == pytest.approx(1e-3 * (0.1 + 0.9 * 0.5))
    assert cos(8) == pytest.approx(1e-4)
    assert cos(12) == pytest.approx(1e-4)  # clamped past decay_epochs

    with pytest.raises(ValueError):
        lr_schedule_fn({"training": {"learning_rate": 1e-3,
                                     "lr_schedule": "sawtooth"}})
    with pytest.raises(ValueError):
        lr_schedule_fn({"training": {"learning_rate": 1e-3,
                                     "lr_schedule": {"decay": 0.1}}})


def test_lr_schedule_applied_per_epoch_and_on_resume(loop_setup):
    """train_model dials lr(epoch) at each epoch start through the injected
    hyperparam (no recompile), logs it, and a resumed run recomputes the
    schedule value for initial_epoch (lr is pure in epoch — no sidecar)."""
    import math

    from trustedai_cl_vae_ad_tpu.train.loop import train_model

    config, model, data = loop_setup
    config["training"]["lr_schedule"] = {
        "type": "exponential", "hold_epochs": 1, "decay": 0.5}
    base = config["training"]["learning_rate"]

    applied = []
    real_dial = model.set_learning_rate
    model.set_learning_rate = lambda lr: (applied.append(lr), real_dial(lr))

    train_model(config, model, data, parallel=False)  # 2 epochs
    assert applied == [pytest.approx(base),
                       pytest.approx(base * math.exp(-0.5))]
    # the live optimizer carries the last epoch's value
    assert model.learning_rate == pytest.approx(base * math.exp(-0.5))
    # per-epoch lr lands in the metrics stream
    lines = [json.loads(l) for l in open(os.path.join(config["logdir"], "metrics.jsonl"))]
    lrs = [l["train/learning_rate"] for l in lines if "train/learning_rate" in l]
    assert lrs == [pytest.approx(base), pytest.approx(base * math.exp(-0.5))]

    # resume at epoch 2 of 3: the first dial is sched(2), not the base lr
    applied.clear()
    config2 = dict(config, logdir=config["logdir"] + "_resumed")
    config2["training"] = dict(config["training"], max_epochs=3)
    os.makedirs(config2["logdir"])
    train_model(config2, model, data, parallel=False, initial_epoch=2)
    assert applied == [pytest.approx(base * math.exp(-1.0))]


def test_async_periodic_checkpointing(tmp_path, monkeypatch):
    """training.async_checkpoint backgrounds the periodic disk writes: the
    loop routes saves through an AsyncSaver, the sidecar still lands only
    after the weights commit (same values as the sync path), and the final
    checkpoint is restorable with continued-training equivalence to a
    normally-saved run."""
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train import checkpoint as ckpt_mod
    from trustedai_cl_vae_ad_tpu.train import loop as loop_mod

    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3], "n_train": 16, "n_val": 8},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1.0, "learning_rate": 1e-3,
                     "max_epochs": 4, "checkpoint_every_epochs": 2,
                     "async_checkpoint": True},
        "logdir": str(tmp_path / "run"),
    }
    os.makedirs(config["logdir"])
    model = load_model_from_config(config)

    async_saves, sidecars = [], []
    real_async_save = ckpt_mod.AsyncSaver.save
    real_sidecar = loop_mod.save_train_state

    def spy_save(self, log_dir, params, opt_state=None):
        async_saves.append(log_dir)
        return real_async_save(self, log_dir, params, opt_state=opt_state)

    def spy_sidecar(logdir, epochs_completed, step, beta):
        sidecars.append((epochs_completed, step, beta))
        return real_sidecar(logdir, epochs_completed, step, beta)

    monkeypatch.setattr(ckpt_mod.AsyncSaver, "save", spy_save)
    monkeypatch.setattr(loop_mod, "save_train_state", spy_sidecar)
    loop_mod.train_model(config, model, load_data(config), parallel=False)

    # the epoch-2 periodic save went through the async path; the final save
    # is the normal synchronous end-of-run save
    assert async_saves == [config["logdir"]]
    # same sidecar record sequence as the sync path (test_periodic_checkpointing):
    # the async commit callback wrote epoch 2's state before the final write
    assert [s[0] for s in sidecars] == [2, 4]
    assert sidecars[0][2] == pytest.approx(0.98**2, rel=1e-6)

    # restorable end state: resume loads weights + optimizer and trains
    resumed = load_model_from_config(config)
    resumed.compile()
    resumed.load_model(config["logdir"], restore_optimizer=True)
    state = loop_mod.load_train_state(config["logdir"])
    assert state["epochs_completed"] == 4
    x = np.random.default_rng(0).random((8, 16, 16, 3), np.float32)
    loss = resumed.train_step(x)
    assert np.isfinite(float(loss["loss"]))


def test_async_autosave_flow(tmp_path):
    """async_autosave=True routes the periodic cache save through the
    engine-owned AsyncSaver: the tick returns while the write backgrounds,
    drain_autosaves() makes it durable, and the cached checkpoint equals the
    engine's live weights (CL donates the saved buffers on the very next
    step — the D2H copy in the blocking portion makes that safe)."""
    import jax

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = {
        "data": {"image_size": [8, 8, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 2,
                  "latent_dimensions": 4, "layers": [2]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    model = load_model_from_config(config)
    model.compile()
    cache = tmp_path / "cache"
    eng = StreamingEngine(
        model, config, model_cache_dir=str(cache), autosave_period_s=0.0,
        async_autosave=True,
    )
    eng.inference_period_ms = 0.0
    eng.continuous_learning_period_ms = 0.0
    eng.enable_cont_learning = True
    frame = np.random.RandomState(0).randint(0, 255, (8, 8, 3), np.uint8)
    eng.process_frame(frame)
    eng._last_autosave_t = -1e9
    eng.process_frame(frame)  # autosave fires: async save + CL donation
    assert eng._async_saver is not None  # the async path was taken
    assert not eng.model_changed_flag
    eng.process_frame(frame)  # CL keeps training on the donated buffers
    saved_params = jax.tree_util.tree_map(np.asarray, model.params)
    eng.drain_autosaves()
    assert eng._async_saver is None

    # the cache dir is the standard log-dir ABI and holds the weights as of
    # the LAST autosave round (a later CL step ran after the final save)
    assert os.path.isdir(cache / "encoder") and os.path.isdir(cache / "decoder")
    restored = load_model_from_config(config)
    restored.load_model(str(cache))
    # same tree structure, finite values — and a forward pass runs
    jax.tree_util.tree_map(lambda a, b: None, saved_params, restored.params)
    out = restored.call(np.zeros((1, 8, 8, 3), np.float32))
    assert np.isfinite(np.asarray(out)).all()
