"""Drive every remaining top-level CLI tool end-to-end through its argv
surface (main() + monkeypatched sys.argv), against a saved tiny model dir.

Covers the tools test_integration.py does not: sample_latent_space,
plot_j_diagram, similarity_analysis, output_reconstructions,
do_anomaly_detection (full CLI incl. threshold flag), gif_me, and
create_video_from_logs — the reference ships all of these untested
(SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tool_env(tmp_path_factory):
    """Saved tiny-model logdir (synthetic-data config), a saved dataset dir,
    and a handful of PNGs."""
    from trustedai_cl_vae_ad_tpu.data.builders.veri import build_veri_dataset
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    root = tmp_path_factory.mktemp("cli_tools")
    config = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3],
                 "n_train": 16, "n_val": 8},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }
    from trustedai_cl_vae_ad_tpu.config import save_config

    model = load_model_from_config(config)
    logdir = root / "run"
    model.save_model(str(logdir))
    save_config(config, os.path.join(str(logdir), "config.yml"))

    rng = np.random.RandomState(0)
    img_dir = root / "imgs"
    img_dir.mkdir()
    img_paths = []
    for i in range(6):
        p = img_dir / f"img_{i}.png"
        Image.fromarray(rng.randint(0, 255, (20, 24, 3), np.uint8)).save(p)
        img_paths.append(str(p))

    ds_dir = root / "saved_ds"
    build_veri_dataset(str(img_dir), str(img_dir), str(ds_dir),
                       image_size=(16, 16), batch_size=4)
    return {"logdir": str(logdir), "root": root, "imgs": img_paths,
            "dataset": str(ds_dir)}


def _run(monkeypatch, module, argv):
    import importlib

    mod = importlib.import_module(module)
    monkeypatch.setattr("sys.argv", [module + ".py"] + argv)
    mod.main()


def test_sample_latent_space_cli(tool_env, monkeypatch, tmp_path):
    out = tmp_path / "latent_sample.png"
    _run(monkeypatch, "sample_latent_space",
         [tool_env["logdir"], "-o", str(out), "--min-z", "-0.5", "--max-z", "0.5"])
    assert os.path.getsize(out) > 0


def test_plot_j_diagram_cli(tool_env, monkeypatch, tmp_path):
    out = tmp_path / "j.png"
    a, b, c = tool_env["imgs"][:3]
    _run(monkeypatch, "plot_j_diagram",
         [tool_env["logdir"], a, b, c, "-o", str(out), "-n", "3"])
    assert os.path.getsize(out) > 0


def test_plot_j_diagram_mixed_resolutions(tool_env, monkeypatch, tmp_path):
    """Attribute images from different sources/resolutions are resized
    individually before stacking (reference plot_j_diagram.py:65-68) —
    a raw np.stack would crash on mismatched shapes."""
    rng = np.random.RandomState(5)
    paths = []
    for i, hw in enumerate(((20, 24), (32, 16), (12, 40))):
        p = tmp_path / f"mix_{i}.png"
        Image.fromarray(rng.randint(0, 255, (*hw, 3), np.uint8)).save(p)
        paths.append(str(p))
    out = tmp_path / "j_mixed.png"
    _run(monkeypatch, "plot_j_diagram",
         [tool_env["logdir"], *paths, "-o", str(out), "-n", "3"])
    assert os.path.getsize(out) > 0


def test_similarity_analysis_cli(tool_env, monkeypatch, tmp_path):
    # reference path semantics: output lands in <output_dir>/similarity
    # (and in <model_dir>/similarity when -o is omitted)
    out = tmp_path / "sim"
    _run(monkeypatch, "similarity_analysis",
         ["-m", tool_env["logdir"], "-d", tool_env["dataset"], "-o", str(out), "-f"])
    sim = out / "similarity"
    assert os.path.getsize(sim / "distances.json") > 0
    assert any(f.endswith(".png") for f in os.listdir(sim))


def test_output_reconstructions_cli(tool_env, monkeypatch):
    # takes only the logdir; dataset comes from the stored config (synthetic)
    _run(monkeypatch, "output_reconstructions", [tool_env["logdir"]])
    imgs = os.path.join(tool_env["logdir"], "imgs")
    assert os.path.isdir(os.path.join(imgs, "originals"))
    assert os.path.isdir(os.path.join(imgs, "reconstructions"))
    assert os.path.getsize(
        os.path.join(tool_env["logdir"], "train_reconstruction_error.json")
    ) > 0


def test_do_anomaly_detection_cli(tool_env, monkeypatch, tmp_path):
    out = tmp_path / "anomaly_out"
    _run(monkeypatch, "do_anomaly_detection",
         ["-m", tool_env["logdir"], "-d", tool_env["dataset"], "-o", str(out),
          "-t", "2.5"])
    names = os.listdir(out)
    # z-score histogram figure + sorted anomaly list + per-frame artifact dirs
    # (do_anomaly_detection.py:142-196 outputs, incl. the post-exit() dumps
    # implemented as working)
    assert "anomaly_fig.png" in names, names
    assert "anomaly_list.csv" in names, names
    for d in ("err", "heatmap", "overlay", "rec"):
        assert os.path.isdir(out / d), names


def test_gif_me_cli(tool_env, monkeypatch, tmp_path):
    out = tmp_path / "out.gif"
    _run(monkeypatch, "gif_me",
         tool_env["imgs"][:4] + ["-o", str(out), "-p", "100"])
    with Image.open(out) as gif:
        # N inputs -> N+1 frames: the blank Image.new seed frame is appended
        # first (reference gif_me.py:33-35 quirk, preserved)
        assert gif.n_frames == 5


def test_create_video_from_logs_cli(tool_env, monkeypatch, tmp_path):
    rng = np.random.RandomState(1)
    rec = tmp_path / "recording"
    for stream in ("frames", "heatmap", "overlay", "err", "rec"):
        d = rec / stream
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (20, 24, 3), np.uint8)).save(
                d / f"20260101-000{i}00-000000.png"
            )
    out = tmp_path / "playback.mkv"
    _run(monkeypatch, "create_video_from_logs",
         [str(rec), "-o", str(out), "-r", "5"])
    if not out.exists() or os.path.getsize(out) == 0:
        pytest.skip("no cv2 video codec available in this environment")
    assert os.path.getsize(out) > 0


def test_do_anomaly_int8_checkpoint_boot(tool_env, monkeypatch, tmp_path, capsys):
    """do_anomaly_detection --quantize boots from <logdir>/quantized when
    present (no float-param materialization) and produces the same artifact
    set."""
    monkeypatch.setenv("TCVAE_QUANT_MIN_ELEMS", "0")
    from trustedai_cl_vae_ad_tpu.ops import quant
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, _cfg = load_model_from_directory(tool_env["logdir"])
    quant.save_quantized_checkpoint(
        tool_env["logdir"], quant.quantize_params(model.core, model.params))
    out = tmp_path / "anomaly_int8"
    _run(monkeypatch, "do_anomaly_detection",
         ["-m", tool_env["logdir"], "-d", tool_env["dataset"], "-o", str(out),
          "-t", "2.5", "--quantize"])
    assert "int8 boot" in capsys.readouterr().out
    names = os.listdir(out)
    assert "anomaly_fig.png" in names and "anomaly_list.csv" in names, names


def test_plot_umap_real_umap_branch(tool_env, monkeypatch, tmp_path):
    """Exercise the REAL-UMAP code path (reference plot_umap.py:67-121) with
    an interface-faithful fake ``umap`` module (umap-learn is absent from
    this env, so only the PCA fallback had ever executed): asserts our code
    constructs UMAP with the reference's hyperparameters and drives
    fit/transform/inverse_transform with the right shapes, through the full
    CLI incl. the --interpolate inverse-transform grid."""
    import sys
    import types

    calls = {"init": None, "fit": [], "transform": [], "inverse": []}

    class FakeUMAP:
        """Records the call protocol; embeds by truncation so the pipeline
        produces valid downstream arrays (like UMAP, NOT an exact inverse)."""

        def __init__(self, **kwargs):
            calls["init"] = kwargs
            self._dim = None

        def fit(self, z):
            z = np.asarray(z)
            assert z.ndim == 2
            self._dim = z.shape[1]
            calls["fit"].append(z.shape)
            return self

        def transform(self, z):
            z = np.asarray(z)
            assert self._dim is not None, "transform before fit"
            assert z.shape[1:] == (self._dim,)
            calls["transform"].append(z.shape)
            return z[:, :2].astype(np.float32)

        def inverse_transform(self, e):
            e = np.asarray(e)
            assert e.shape[1:] == (2,)
            calls["inverse"].append(e.shape)
            out = np.zeros((e.shape[0], self._dim), np.float32)
            out[:, :2] = e
            return out

    fake_mod = types.ModuleType("umap")
    fake_mod.UMAP = FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake_mod)

    out = tmp_path / "umap.png"
    interp = tmp_path / "umap_interp.png"
    _run(monkeypatch, "plot_umap",
         [tool_env["logdir"], "-o", str(out), "-n", "7", "-d", "0.25",
          "-m", "cosine", "--standardize", "--interpolate", "-t", str(interp)])

    assert out.exists() and interp.exists()
    # constructor got the CLI hyperparameters (reference plot_umap.py:67-73)
    assert calls["init"] == {"n_neighbors": 7, "n_components": 2,
                             "min_dist": 0.25, "metric": "cosine",
                             "verbose": True}
    # fit on train latents; transform on train AND val; one 10x10 grid inverse
    assert calls["fit"] == [(16, 8)]
    assert calls["transform"] == [(16, 8), (8, 8)]
    assert calls["inverse"] == [(100, 2)]
