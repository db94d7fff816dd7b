"""Reference-as-ORACLE e2e parity: the reference's OWN code is the baseline.

Unlike test_tf_import.py (which builds an architecture twin in this repo's
test code), every oracle number here is produced by the reference's executable
code, imported read-only from /root/reference via sys.path:

  * src/load_model.py::load_model_from_config builds the model,
  * abstract_cvae.py:154-162 ``train_step`` trains it a few real steps
    (the exact method Keras ``model.fit`` drives in reference train.py:123),
  * the encoder/decoder SavedModel logdir is written in the format
    train.py:127-128 produces,
  * tools/import_tf_checkpoint.py converts that logdir into our ABI,
  * kurtosis_global_cvae.py:40-110 ``compute_loss`` is the loss-dict oracle,
  * do_anomaly_detection.py:57-117 ``get_data_scale`` / ``evaluate_anomalies``
    are the two-pass anomaly oracle.

Keras-3 note: this environment's keras (3.x) removed ``model.save(<dir>)``
SavedModel saving, so the oracle checkpoint is written with
``tf.saved_model.save`` — the same on-disk SavedModel format the reference's
pinned TF2/Keras2 environment produced from train.py:127-128.

The reference tree is imported with ``sys.dont_write_bytecode`` set (it is
read-only) and its ``src`` package is swapped into sys.modules around this
module only — our own ``src/`` re-export shims are restored afterwards.
"""

import importlib
import importlib.util
import os
import runpy
import sys
from types import SimpleNamespace

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REFERENCE_ROOT = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = {
    "data": {"image_size": [20, 24, 3]},
    "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
             "w_mse": 1.0, "w_skew": 1e-4, "w_x_std": 0.0, "w_z_l1_reg": 1e-4},
    "model": {"type": "KurtosisGlobal", "latent_dimensions": 6,
              "layers": [4, 8], "decoder_dense_filters": 4},
    "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                 "max_epochs": 1},
}
# Both reference-executable families run against the reference's own code:
# KurtosisGlobal (kurtosis_global_cvae.py:40-110) and KurtosisSingle
# (kurtosis_single_cvae.py:25-77 — incl. the w_z_l1-weights-z_l2 mismatch at
# :56-60, the quirkiest behavior to preserve). KLGaussian is exempt: the
# reference raises NotImplementedError for it (load_model.py:24).
FAMILIES = ["KurtosisGlobal", "KurtosisSingle"]


@pytest.fixture(scope="module")
def ref():
    """The reference's own modules, imported read-only from /root/reference."""
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    import matplotlib

    matplotlib.use("Agg")  # do_anomaly_detection imports pyplot at module top
    saved_bytecode = sys.dont_write_bytecode
    sys.dont_write_bytecode = True  # /root/reference must stay pristine
    # our repo has its own `src` re-export shims — swap them out for the
    # reference's real `src` package and restore afterwards
    saved_src = {k: v for k, v in sys.modules.items()
                 if k == "src" or k.startswith("src.")}
    for k in saved_src:
        del sys.modules[k]
    # do_anomaly_detection imports src/data_loader, which imports
    # tensorflow_datasets (absent in this env). The oracle functions under
    # test never touch it — we feed data dicts directly — so stub the module.
    stubbed_tfds = "tensorflow_datasets" not in sys.modules
    if stubbed_tfds:
        import types

        sys.modules["tensorflow_datasets"] = types.ModuleType("tensorflow_datasets")
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        load_model = importlib.import_module("src.load_model")
        assert load_model.__file__.startswith(REFERENCE_ROOT)
        spec = importlib.util.spec_from_file_location(
            "_reference_do_anomaly",
            os.path.join(REFERENCE_ROOT, "do_anomaly_detection.py"))
        anom = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(anom)
        yield SimpleNamespace(load_model=load_model, anom=anom)
    finally:
        sys.path.remove(REFERENCE_ROOT)
        for k in [k for k in sys.modules if k == "src" or k.startswith("src.")]:
            del sys.modules[k]
        sys.modules.update(saved_src)
        if stubbed_tfds:
            sys.modules.pop("tensorflow_datasets", None)
        sys.dont_write_bytecode = saved_bytecode


@pytest.fixture(scope="module", params=FAMILIES)
def oracle(request, ref, tmp_path_factory):
    """Train the reference a few steps, save its logdir, import it here.
    Parametrized over both reference-executable model families."""
    import copy

    import yaml

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    config = copy.deepcopy(CONFIG)
    config["model"]["type"] = request.param

    tf.keras.utils.set_random_seed(0)
    vae = ref.load_model.load_model_from_config(copy.deepcopy(config))
    # reference train.py:99-101
    vae.compile(optimizer=tf.keras.optimizers.Adam(
        learning_rate=float(config["training"]["learning_rate"])))

    rng = np.random.RandomState(7)
    # per-frame brightness spread keeps the error distribution's sigma well
    # conditioned: z = (err - mu)/sigma amplifies f32 backend noise by 1/sigma,
    # and an all-i.i.d. scale set makes sigma degenerately small
    def _batch():
        scales = rng.uniform(0.25, 1.0, size=(4, 1, 1, 1)).astype(np.float32)
        return (rng.random((4, 20, 24, 3)).astype(np.float32) * scales)

    scale_batches = [_batch() for _ in range(3)]
    # eval set: two normal batches plus frames with a bright blob anomaly
    eval_batches = [_batch() for _ in range(2)]
    eval_batches[1][2:, 4:16, 6:18, :] = 1.0

    for _ in range(2):  # the loop model.fit runs (reference train.py:123)
        for batch in scale_batches:
            vae.train_step(tf.constant(batch))  # abstract_cvae.py:154-162

    logdir = tmp_path_factory.mktemp("oracle_logdir")
    # train.py:127-128's SavedModel layout (tf.saved_model.save under keras 3)
    tf.saved_model.save(vae.encoder, str(logdir / "encoder"))
    tf.saved_model.save(vae.decoder, str(logdir / "decoder"))
    (logdir / "config.yml").write_text(yaml.safe_dump(config))

    converted = tmp_path_factory.mktemp("oracle_converted")
    argv = sys.argv
    sys.argv = ["import_tf_checkpoint.py", str(logdir), str(converted),
                "--verify"]
    try:  # the actual CLI tool, --verify included (its own <1e-5 gate)
        runpy.run_path(os.path.join(REPO_ROOT, "tools", "import_tf_checkpoint.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv

    model, config = load_model_from_directory(str(converted))
    return SimpleNamespace(vae=vae, model=model, config=config,
                           scale_batches=scale_batches,
                           eval_batches=eval_batches)


def _assert_scalar_close(key, ref_val, ours_val, tol=1e-5):
    assert abs(ref_val - ours_val) <= tol * max(1.0, abs(ref_val)), (
        key, ref_val, ours_val)


def test_loss_dict_parity_vs_reference(oracle):
    """Per-key loss-dict equality on identical weights+inputs: our test_step
    against the reference's compute_loss (kurtosis_global_cvae.py:40-110)."""
    for x in (oracle.scale_batches[0], oracle.eval_batches[1]):
        ref_dict = oracle.vae.compute_loss(tf.constant(x), training=False)
        ours_dict = oracle.model.test_step(x)
        assert set(ref_dict.keys()) == set(ours_dict.keys())
        for key in ref_dict:
            _assert_scalar_close(key, float(ref_dict[key]), float(ours_dict[key]))


def test_two_pass_anomaly_parity_vs_reference(oracle, ref):
    """Two-pass anomaly z-scores and decisions vs the reference's own
    get_data_scale / evaluate_anomalies (do_anomaly_detection.py:57-117)."""
    from trustedai_cl_vae_ad_tpu.anomaly import offline

    tf_scale_data = {"train": [tf.constant(b) for b in oracle.scale_batches]}
    ref_scale = ref.anom.get_data_scale(oracle.vae, oracle.config, tf_scale_data)
    ours_scale = offline.get_data_scale(
        oracle.model, oracle.config, {"train": oracle.scale_batches})
    for key in ("meu", "sigma", "min", "max"):
        _assert_scalar_close(key, float(ref_scale[key]), float(ours_scale[key]))
    np.testing.assert_allclose(ours_scale["z_scores"],
                               ref_scale["z_scores"].numpy(), atol=1e-5)

    tf_eval_data = {"train": [tf.constant(b) for b in oracle.eval_batches]}
    ref_res = ref.anom.evaluate_anomalies(
        oracle.vae, oracle.config, tf_eval_data, ref_scale, 3.0)
    ours_res = offline.evaluate_anomalies(
        oracle.model, oracle.config, {"train": oracle.eval_batches},
        ours_scale, 3.0, keep_maps=True)

    # guard against a degenerate all-identical comparison
    assert float(np.ptp(ref_res["z_scores"])) > 0.1
    np.testing.assert_allclose(ours_res["z_scores"], ref_res["z_scores"],
                               atol=1e-5)
    np.testing.assert_array_equal(ours_res["anomalies"], ref_res["anomalies"])
    np.testing.assert_allclose(ours_res["norm_errs"], ref_res["norm_errs"],
                               atol=1e-4)
    np.testing.assert_allclose(ours_res["errs"], ref_res["errs"],
                               atol=1e-4, rtol=1e-4)
