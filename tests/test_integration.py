"""End-to-end flows across subsystem seams (BASELINE config #4 path)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_veri_flow_build_train_tools(tmp_path):
    """image dirs -> VeRi builder -> saved dataset -> train_model -> latent
    tools (umap w/ PCA fallback, interpolate) against the trained logdir."""
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.data.builders.veri import build_veri_dataset
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.loop import train_model

    rng = np.random.RandomState(0)
    for split, n in (("train_imgs", 12), ("val_imgs", 6)):
        d = tmp_path / split
        d.mkdir()
        for i in range(n):
            Image.fromarray(rng.randint(0, 255, (30, 40, 3), np.uint8)).save(d / f"{i}.jpg")

    ds_dir = tmp_path / "veri_ds"
    build_veri_dataset(str(tmp_path / "train_imgs"), str(tmp_path / "val_imgs"),
                       str(ds_dir), image_size=(24, 24), batch_size=4)
    assert os.path.isdir(ds_dir / "train")
    assert os.path.isdir(ds_dir / "validation")

    config = {
        "data": {"dataset_path": str(ds_dir), "train_split": "train",
                 "val_split": "validation", "image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 2,
                  "latent_dimensions": 4, "layers": [2]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
        "logdir": str(tmp_path / "run"),
    }
    os.makedirs(config["logdir"])
    save_config(config, os.path.join(config["logdir"], "config.yml"))
    model = load_model_from_config(config)
    data = load_data(config)
    model = train_model(config, model, data, parallel=False)
    assert os.path.isdir(os.path.join(config["logdir"], "encoder"))

    # latent tooling against the trained logdir
    import plot_umap

    embedder, train_emb, val_emb, _ = plot_umap.plot_umap(
        data, model, str(tmp_path / "umap.png"), n_neighbors=5, min_distance=0.1
    )
    assert train_emb.shape[1] == 2 and len(val_emb)
    plot_umap.plot_interpolation(model, embedder, train_emb, val_emb, None,
                                 str(tmp_path / "umap_interp.png"))
    assert os.path.getsize(tmp_path / "umap_interp.png") > 0

    import interpolate

    interpolate.example_interpolate(config, model, str(tmp_path / "interp.png"),
                                    k_sample_points=3, N=2)
    assert os.path.getsize(tmp_path / "interp.png") > 0


def test_decoder_generator_headless(tmp_path):
    """decoder_generator_qt.py headless --decode-z drive (subprocess CLI)."""
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"dataset": "synthetic", "image_size": [8, 8, 3], "n_train": 8, "n_val": 4},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 2,
                  "latent_dimensions": 4, "layers": [2]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    d = tmp_path / "model"
    d.mkdir()
    save_config(config, str(d / "config.yml"))
    model = load_model_from_config(config)
    model.save_model(str(d), include_optimizer=False)

    out = tmp_path / "decoded.png"
    env = dict(os.environ, TCVAE_PLATFORM="cpu", PYTHONPATH=REPO_ROOT)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "decoder_generator_qt.py"), str(d),
         "--decode-z", "0.5,-0.5,0.1,0.0", "-o", str(out)],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO_ROOT,
    )
    assert result.returncode == 0, result.stderr[-400:]
    assert os.path.getsize(out) > 0


def test_qt_shells_gate_cleanly():
    """Without PyQt5 the Qt CLIs import fine and exit 2 with guidance."""
    import camera_streamer_qt

    if camera_streamer_qt.HAVE_QT:
        pytest.skip("PyQt5 present; gating path not applicable")
    env = dict(os.environ, TCVAE_PLATFORM="cpu", PYTHONPATH=REPO_ROOT)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "camera_streamer_qt.py"),
         os.path.join(REPO_ROOT, "configs/cam_config.yml")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO_ROOT,
    )
    assert result.returncode == 2
    assert "camera_streamer.py" in result.stderr  # points at the headless CLI


def test_camera_streamer_sigterm_finalizes_recording(tmp_path):
    """SIGTERM (supervisor stop) on the streaming CLI runs the clean-shutdown
    path: recording closes with labels.json + a model snapshot instead of a
    dangling instance dir (review r4 — finally blocks don't run on SIGTERM)."""
    import signal
    import time

    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"dataset": "synthetic", "image_size": [8, 8, 3], "n_train": 8, "n_val": 4},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 2,
                  "latent_dimensions": 4, "layers": [2]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    d = tmp_path / "model"
    d.mkdir()
    save_config(config, str(d / "config.yml"))
    model = load_model_from_config(config)
    model.save_model(str(d), include_optimizer=False)
    rec = tmp_path / "recdir"
    rec.mkdir()

    env = dict(os.environ, TCVAE_PLATFORM="cpu", PYTHONPATH=REPO_ROOT)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO_ROOT, "camera_streamer.py"),
         "--source", "synthetic", "-m", str(d), "-r", str(rec)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO_ROOT,
    )
    try:
        # wait until frames are flowing (the recorder writes its first PNG)
        deadline = time.time() + 180
        instance = None
        while time.time() < deadline:
            dirs = sorted(os.listdir(rec))
            if dirs:
                frames = os.path.join(rec, dirs[0], "frames")
                if os.path.isdir(frames) and os.listdir(frames):
                    instance = os.path.join(rec, dirs[0])
                    break
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        assert proc.poll() is None, f"streamer exited early:\n{proc.stdout.read()}"
        assert instance is not None, "recording never started"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-600:]
    assert os.path.exists(os.path.join(instance, "labels.json")), out[-600:]
    assert os.path.isdir(os.path.join(instance, "model"))


def test_camera_streamer_max_rss_guard_exits_3_after_saving(tmp_path):
    """--max-rss-mb (operational guard for the tunnel client's host-RSS leak,
    SERVING.md): when RSS exceeds the limit the CLI saves dirty CL state to
    the model cache, runs the normal graceful shutdown, and exits with the
    distinct restart code 3 so a supervisor restarts the process."""
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"dataset": "synthetic", "image_size": [8, 8, 3], "n_train": 8, "n_val": 4},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 2,
                  "latent_dimensions": 4, "layers": [2]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    d = tmp_path / "model"
    d.mkdir()
    save_config(config, str(d / "config.yml"))
    model = load_model_from_config(config)
    model.save_model(str(d), include_optimizer=False)
    cache = tmp_path / "cache"

    env = dict(os.environ, TCVAE_PLATFORM="cpu", PYTHONPATH=REPO_ROOT)
    # any real python process is far above 1 MB RSS: trips on the first poll
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "camera_streamer.py"),
         "--source", "synthetic", "-m", str(d), "--max-frames", "200",
         "--max-rss-mb", "1", "-c", "--model-cache-dir", str(cache)],
        capture_output=True, text=True, env=env, cwd=REPO_ROOT, timeout=600,
    )
    assert proc.returncode == 3, proc.stdout[-1500:] + proc.stderr[-800:]
    assert "exceeded --max-rss-mb" in proc.stdout


def test_defer_signals_blocks_until_exit():
    """defer_signals (the donation-safety mask around every donating
    dispatch): a signal delivered inside the block is deferred to the
    context exit — never mid-donation."""
    import signal

    from trustedai_cl_vae_ad_tpu.utils.profiling import defer_signals

    hits = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        with defer_signals():
            os.kill(os.getpid(), signal.SIGTERM)
            # handling is deferred: the user handler must NOT have run yet
            assert hits == []
        # mask restored on exit: the pending signal fires here
        assert hits == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.utils import profiling

    with profiling.trace(str(tmp_path)):
        y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 8)))
        profiling.device_fence(y)
    produced = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert produced, "profiler trace produced no files"
    timer = profiling.StepTimer()
    with timer.step(fence_tree=y):
        jax.jit(lambda x: x + 1)(y)
    assert timer.p50_ms() is not None


def test_device_fence_shapes():
    """device_fence handles scalar / n-d / pytree leaves and returns the
    first element (it must INDEX, not ravel: an eager ravel dispatches a
    full-tensor copy, which OOMed fencing a 310 MB batch at the HBM edge)."""
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    assert device_fence(jnp.float32(7.0)) == 7.0
    assert device_fence(3.0) == 3.0  # plain Python scalar leaves
    assert device_fence({"a": 3, "b": jnp.ones(2)}) == 3.0
    assert device_fence(jnp.arange(5, dtype=jnp.int32) + 3) == 3.0
    assert device_fence({"a": jnp.full((2, 3, 4), 2.5)}) == 2.5
    assert device_fence([jnp.zeros((1, 1), jnp.bfloat16)]) == 0.0
