"""tools/validate_logdir.py: the checkpoint-directory doctor.

Covers the health matrix: healthy dir, config/weights drift, missing pieces,
sidecar consistency (train_state, quantized staleness, replay provenance),
and the CLI exit codes.
"""

import json
import os
import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np
import pytest

import trustedai_cl_vae_ad_tpu as tc

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from validate_logdir import validate_logdir  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_config():
    cfg = tc.load_config(os.path.join(REPO, "configs", "synthetic_small.yml"))
    cfg["data"]["image_size"] = [32, 32, 3]
    cfg["model"]["latent_dimensions"] = 8
    cfg["model"]["layers"] = [4, 8]
    return cfg


@pytest.fixture(scope="module")
def logdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("doctor_logdir"))
    cfg = _tiny_config()
    m = tc.load_model_from_config(cfg)
    m.compile()
    m.train_step(jnp.asarray(
        np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32))
    tc.save_config(cfg, os.path.join(d, "config.yml"))
    m.save_model(d)
    from trustedai_cl_vae_ad_tpu.train.loop import save_train_state
    save_train_state(d, epochs_completed=1, step=2, beta=1e-6)
    return d


def test_healthy_dir(logdir):
    rep = validate_logdir(logdir)
    assert rep["errors"] == []
    assert rep["warnings"] == []
    assert rep["info"]["optimizer_state"] is True
    assert rep["info"]["train_state"]["epochs_completed"] == 1
    assert rep["info"]["latent_dimensions"] == 8


def test_config_weight_drift_is_an_error(logdir, tmp_path):
    import shutil

    d = str(tmp_path / "drift")
    shutil.copytree(logdir, d)
    cfg = _tiny_config()
    cfg["model"]["latent_dimensions"] = 16  # weights were saved at 8
    tc.save_config(cfg, os.path.join(d, "config.yml"))
    rep = validate_logdir(d)
    assert any("drift" in e for e in rep["errors"]), rep["errors"]


def test_missing_pieces(tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    rep = validate_logdir(d)
    assert any("config.yml missing" in e for e in rep["errors"])

    tc.save_config(_tiny_config(), os.path.join(d, "config.yml"))
    rep = validate_logdir(d)
    assert any("encoder/ checkpoint missing" in e for e in rep["errors"])
    assert any("decoder/ checkpoint missing" in e for e in rep["errors"])


def test_stale_quantized_warns_mtime_fallback(logdir, tmp_path):
    """No content provenance at all (hand-made quantized/ dir): the mtime
    fallback fires with the soft 'MAY be stale' wording."""
    import shutil

    d = str(tmp_path / "stale_q")
    shutil.copytree(logdir, d)
    from trustedai_cl_vae_ad_tpu.ops.quant import QUANTIZED_SUBDIR

    qdir = os.path.join(d, QUANTIZED_SUBDIR)
    os.makedirs(qdir)
    with open(os.path.join(qdir, "marker"), "w") as f:
        f.write("x")
    old = time.time() - 3600
    os.utime(os.path.join(qdir, "marker"), (old, old))
    rep = validate_logdir(d)
    assert any("MAY be stale" in w for w in rep["warnings"])


def test_quantized_provenance_is_content_based(logdir, tmp_path):
    """Fresh sidecar: healthy even when mtimes LIE (float checkpoint touched
    newer, as cp -p / rsync -a / clock skew produce); after a retrain the
    provenance mismatch warns even when mtimes are equalized."""
    import shutil

    import jax.numpy as jnp

    d = str(tmp_path / "prov_q")
    shutil.copytree(logdir, d)
    from trustedai_cl_vae_ad_tpu.ops.quant import (
        QUANTIZED_SUBDIR,
        quantize_params,
        save_quantized_checkpoint,
    )

    m, _ = tc.load_model_from_directory(d)
    qp = quantize_params(m.core, m.params, min_elems=1)
    save_quantized_checkpoint(d, qp)

    # fresh sidecar + mtime lie: no staleness warning (content evidence wins)
    now = time.time()
    for r, _dirs, fs in os.walk(os.path.join(d, "encoder")):
        for f in fs:
            os.utime(os.path.join(r, f), (now + 3600, now + 3600))
    rep = validate_logdir(d)
    assert not any("stale" in w.lower() or "DIFFERENT float" in w
                   for w in rep["warnings"]), rep["warnings"]

    # retrain + resave the float checkpoint: provenance mismatch warns even
    # with the quantized/ tree's mtimes pushed into the future
    m.compile()
    m.train_step(jnp.asarray(
        np.random.RandomState(1).rand(4, 32, 32, 3), jnp.float32))
    m.save_model(d)
    for r, _dirs, fs in os.walk(os.path.join(d, QUANTIZED_SUBDIR)):
        for f in fs:
            os.utime(os.path.join(r, f), (now + 7200, now + 7200))
    rep = validate_logdir(d)
    assert any("DIFFERENT float checkpoint" in w for w in rep["warnings"]), \
        rep["warnings"]


def test_precision_drift_warns(logdir, tmp_path):
    """Checkpoint saved under one training.precision, config says another:
    leaf shapes match but dtypes differ — surfaced as a warning (ADVICE r3)."""
    import shutil

    d = str(tmp_path / "dtype_drift")
    shutil.copytree(logdir, d)
    cfg = _tiny_config()
    cfg["training"]["precision"] = "bfloat16"  # weights were saved f32
    tc.save_config(cfg, os.path.join(d, "config.yml"))
    rep = validate_logdir(d)
    assert rep["errors"] == []
    assert any("dtype" in w and "training.precision" in w
               for w in rep["warnings"]), rep["warnings"]


def test_replay_provenance_missing_files_warn(logdir, tmp_path):
    import shutil

    d = str(tmp_path / "replay")
    shutil.copytree(logdir, d)
    with open(os.path.join(d, "replay_buffer_paths.csv"), "w") as f:
        f.write("/nonexistent/frame_0001.png\n")
    rep = validate_logdir(d)
    assert any("replay provenance" in w for w in rep["warnings"])
    assert rep["info"]["replay_paths"] == 1


def test_cli_exit_codes(logdir, tmp_path):
    env = dict(os.environ, TCVAE_PLATFORM="cpu")
    tool = os.path.join(REPO, "tools", "validate_logdir.py")
    r = subprocess.run([sys.executable, tool, logdir, "--json"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    rep = json.loads(r.stdout)
    assert rep["errors"] == []

    # strict mode: a warning (missing train_state) flips the exit code
    import shutil
    d = str(tmp_path / "warned")
    shutil.copytree(logdir, d)
    os.remove(os.path.join(d, "train_state.json"))
    r = subprocess.run([sys.executable, tool, d, "--strict"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 2, (r.returncode, r.stdout)
    assert "train_state.json missing" in r.stdout


def test_all_none_provenance_falls_back_to_mtimes(logdir, tmp_path):
    """A provenance stamp whose values are all None (orbax metadata files
    absent at quantization time) carries no content evidence: it must not
    compare 'equal' to an equally-blank current stamp and certify a stale
    sidecar as fresh — the doctor falls back to the mtime check."""
    import json as _json
    import shutil

    d = str(tmp_path / "blank_prov_q")
    shutil.copytree(logdir, d)
    from trustedai_cl_vae_ad_tpu.ops.quant import PROVENANCE_FILE, QUANTIZED_SUBDIR

    qdir = os.path.join(d, QUANTIZED_SUBDIR)
    os.makedirs(qdir)
    with open(os.path.join(qdir, PROVENANCE_FILE), "w") as f:
        _json.dump({"float_checkpoint": {"encoder": None, "decoder": None}}, f)
    # strip the float checkpoint's metadata so its stamp is all-None too
    for side in ("encoder", "decoder"):
        meta = os.path.join(d, side, "_CHECKPOINT_METADATA")
        if os.path.exists(meta):
            os.remove(meta)
    old = time.time() - 3600
    for r, _dirs, fs in os.walk(qdir):
        for fn in fs:
            os.utime(os.path.join(r, fn), (old, old))
    rep = validate_logdir(d)
    assert any("MAY be stale" in w for w in rep["warnings"]), rep["warnings"]
