"""Int8 quantized serving forward (ops/quant.py).

Validates: (a) the unquantized transcription reproduces core.call exactly,
(b) int8 weight quantization error bounds, (c) quantized reconstruction
fidelity and (d) anomaly-decision parity with the float path on a synthetic
scene — the contract the serving integrations (serve.py --quantize,
MultiCameraEngine quantize=True) rely on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
from trustedai_cl_vae_ad_tpu.ops import quant


def _small_config():
    return {
        "data": {"image_size": [64, 48, 3]},
        "loss": {
            "kurtosis": 1.8,
            "w_kl_divergence": 0.0,
            "w_kurtosis": 1e-4,
            "w_mse": 1.0,
            "w_skew": 0.0,
            "w_x_std": 0.0,
            "w_z_l1_reg": 0.0,
        },
        "model": {
            "type": "KurtosisGlobal",
            "latent_dimensions": 8,
            "layers": [4, 8],
            "decoder_dense_filters": 8,
        },
        "training": {"batch_size": 4, "beta": 0.98, "learning_rate": 1e-4, "max_epochs": 1},
    }


@pytest.fixture(scope="module")
def model_and_input():
    core = KurtosisGlobalCVAE(_small_config())
    params = core.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 48, 3))
    return core, params, x


@pytest.mark.parametrize("encoder_dense", [None, 16])
def test_unquantized_transcription_matches_call(encoder_dense):
    """Covers both encoder shapes: with and without the optional
    encoder_dense_filters bottleneck (Dense_0 -> Dense_1 naming)."""
    cfg = _small_config()
    if encoder_dense:
        cfg["model"]["encoder_dense_filters"] = encoder_dense
    core = KurtosisGlobalCVAE(cfg)
    params = core.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 48, 3))
    ref = core.call(params, x, training=False)
    # min_elems larger than any kernel -> nothing quantized; pure transcription
    qp = quant.quantize_params(core, params, min_elems=1 << 62)
    got = quant.call_quantized(core, qp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_call_quantized_uint8_matches_normalized_float(model_and_input):
    """call_quantized honors the uint8 input contract (raw 0-255 pixels
    normalize on device, like core.call) — it used to cast uint8 straight to
    the compute dtype, feeding raw 0-255 values (review round 4)."""
    core, params, x = model_and_input
    x_u8 = np.asarray(
        np.clip(np.round(np.asarray(x) * 255.0), 0, 255), dtype=np.uint8
    )
    qp = quant.quantize_params(core, params, min_elems=1 << 62)
    got = quant.call_quantized(core, qp, jnp.asarray(x_u8))
    ref = quant.call_quantized(core, qp, jnp.asarray(x_u8, jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # and parity with the float core.call on the same uint8 batch
    ref_core = core.call(params, jnp.asarray(x_u8), training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_core), atol=1e-6)


def test_chunked_int8_contraction_matches_single_dot():
    """The int32-headroom chunked accumulation (K > _I32_SAFE_K) equals the
    single-dot path (patched threshold forces chunking on a small K)."""
    from unittest import mock

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 300).astype(np.float32))
    w = jnp.asarray(rng.randn(300, 7).astype(np.float32))
    k_i8, scale = quant.quantize_dense_kernel(w)
    p = {"kernel_i8": k_i8, "scale": scale, "bias": jnp.zeros((7,), jnp.float32)}
    ref = quant._dense(p, x, jnp.float32, "w8a8")
    with mock.patch.object(quant, "_I32_SAFE_K", 128):  # 300 -> 3 chunks
        got = quant._dense(p, x, jnp.float32, "w8a8")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5)


def test_dense_rejects_unknown_mode(model_and_input):
    core, params, _ = model_and_input
    p = params["decoder"]["Dense_0"]
    with pytest.raises(ValueError, match="unknown quantization mode"):
        quant._dense(p, jnp.zeros((1, p["kernel"].shape[0])), jnp.float32, "w8a16")


def test_kernel_quantization_error_bound(model_and_input):
    core, params, _ = model_and_input
    w = params["decoder"]["Dense_0"]["kernel"]
    k_i8, scale = quant.quantize_dense_kernel(w)
    assert k_i8.dtype == jnp.int8
    err = np.abs(np.asarray(w, np.float32) - np.asarray(k_i8, np.float32) * np.asarray(scale))
    # symmetric rounding: per-column error <= scale/2 (+ float slack)
    assert (err <= np.asarray(scale) * 0.5 + 1e-7).all()


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_quantized_reconstruction_fidelity(model_and_input, mode):
    core, params, x = model_and_input
    ref = np.asarray(core.call(params, x, training=False))
    qp = quant.quantize_params(core, params, min_elems=0)  # quantize every Dense
    got = np.asarray(quant.call_quantized(core, qp, x, mode=mode))
    mse = float(np.mean((got - ref) ** 2))
    # sigmoid outputs in [0,1]; int8 per-channel weights keep the
    # reconstruction within a tight band of the float forward
    assert mse < 1e-4, mse
    assert np.max(np.abs(got - ref)) < 0.05


def test_anomaly_decision_parity(model_and_input):
    """Per-frame anomaly z-scores (do_anomaly_detection.py:62-92 math) agree
    between the float and quantized forwards: same eps ordering and nearly
    identical z on a clean-vs-blob synthetic pair."""
    core, params, _ = model_and_input
    rng = np.random.RandomState(0)
    clean = np.full((64, 48, 3), 0.5, np.float32) + rng.uniform(-0.02, 0.02, (64, 48, 3)).astype(np.float32)
    blob = clean.copy()
    blob[20:40, 15:35, :] = 1.0
    x = jnp.asarray(np.stack([clean, blob]))

    def eps_of(x_hat):
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        return np.asarray(jnp.sum(err, axis=(1, 2)))

    eps_f = eps_of(core.call(params, x, training=False))
    qp = quant.quantize_params(core, params, min_elems=0)
    eps_q = eps_of(quant.call_quantized(core, qp, x))
    # identical ordering (blob scores higher) and small relative deviation
    assert eps_f[1] > eps_f[0] and eps_q[1] > eps_q[0]
    np.testing.assert_allclose(eps_q, eps_f, rtol=0.02)


def test_multicam_quantized_matches_float(model_and_input):
    """MultiCameraEngine(quantize=True) tracks the float engine's scores on
    the same frames (the tiny model's Dense kernels are force-quantized via
    a patched threshold, exercising the real serving integration)."""
    from unittest import mock

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    cfg = _small_config()
    model = load_model_from_config(cfg)
    # static scene + small noise: warmup NaN ticks (zero-variance score
    # denominators) resolve identically for both paths, unlike pure noise
    # where quantization can tip a knife-edge zero std
    rng = np.random.RandomState(7)
    base = rng.randint(0, 255, (2, 64, 48, 3)).astype(np.int16)
    frames = [
        np.clip(base + rng.randint(-3, 4, base.shape), 0, 255).astype(np.uint8)
        for _ in range(8)
    ]
    f_eng = MultiCameraEngine(model, cfg, n_streams=2)
    with mock.patch.object(quant, "DEFAULT_MIN_ELEMS", 0):
        q_eng = MultiCameraEngine(model, cfg, n_streams=2, quantize=True)
    for tick in frames:
        f_out = f_eng.process_frames(list(tick))
        q_out = q_eng.process_frames(list(tick))
    # decision-level parity: the discrete zz-pixel-count score of a tiny
    # random model is knife-edge sensitive (numeric fidelity of the forward
    # itself is asserted at rtol 2% above); what the integration guarantees
    # is finite scoring and identical anomaly decisions on a static scene
    for i in range(2):
        assert np.isfinite(q_out[i].score_ma) and np.isfinite(f_out[i].score_ma)
        assert q_out[i].anomalous == f_out[i].anomalous
    # and both paths alarm on a large blob anomaly
    blob = [t.copy() for t in frames[-1]]
    for b in blob:
        b[10:50, 10:40, :] = 255
    f_blob = f_eng.process_frames(blob)
    q_blob = q_eng.process_frames(blob)
    for i in range(2):
        assert f_blob[i].score > f_out[i].score
        assert q_blob[i].score > q_out[i].score


def test_streaming_engine_quantized_cl_requantizes(model_and_input):
    """StreamingEngine(quantize=True): the inference dispatch runs on the
    int8 serving copy, and a CL step re-quantizes it from the freshly
    trained float params."""
    from unittest import mock

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    cfg = _small_config()
    model = load_model_from_config(cfg)
    with mock.patch.object(quant, "DEFAULT_MIN_ELEMS", 0):
        eng = StreamingEngine(model, cfg, quantize=True)
        eng.inference_period_ms = 0.0
        eng.continuous_learning_period_ms = 0.0
        eng.enable_cont_learning = True

        assert "kernel_i8" in eng._serve_params["decoder"]["Dense_0"]
        before = np.asarray(eng._serve_params["decoder"]["Dense_0"]["kernel_i8"])

        rng = np.random.RandomState(3)
        r = None
        for t in range(3):
            r = eng.process_frame(rng.randint(0, 255, (64, 48, 3), np.uint8),
                                  now=float(t + 1))
        assert r is not None and np.isfinite(r.pixel_count)
        assert eng.cl_epochs >= 1  # CL actually stepped
        after = np.asarray(eng._serve_params["decoder"]["Dense_0"]["kernel_i8"])
        assert (before != after).any()  # serving copy tracked the CL update


def test_quantize_params_preserves_convs(model_and_input):
    core, params, _ = model_and_input
    qp = quant.quantize_params(core, params, min_elems=0)
    # convs untouched (same objects), dense entries carry int8 kernels
    assert qp["encoder"]["Conv_0"]["kernel"] is params["encoder"]["Conv_0"]["kernel"]
    assert "kernel_i8" in qp["decoder"]["Dense_0"]


def test_sharded_quantized_scoring_matches_single_device():
    """do_anomaly_detection supports --quantize AND multi-device batch
    sharding together: the sharded quantized passes must equal the
    single-device quantized passes (the int8 param tree replicates over the
    mesh like any pytree)."""
    from unittest import mock

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from trustedai_cl_vae_ad_tpu.anomaly.offline import evaluate_anomalies, get_data_scale
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh, replicate
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    cfg = {
        "data": {"dataset": "synthetic", "image_size": [16, 16, 3],
                 "n_train": 16, "n_val": 8},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }
    model = load_model_from_config(cfg)
    data = load_data(cfg)
    with mock.patch.object(quant, "DEFAULT_MIN_ELEMS", 0):
        scale_1 = get_data_scale(model, cfg, data, quantize=True)
        res_1 = evaluate_anomalies(model, cfg, data, scale_1, 3.0, keep_maps=False,
                                   quantize=True)
        mesh = make_mesh()
        model.params = replicate(model.params, mesh)
        scale_m = get_data_scale(model, cfg, data, mesh=mesh, quantize=True)
        res_m = evaluate_anomalies(model, cfg, data, scale_m, 3.0, keep_maps=False,
                                   mesh=mesh, quantize=True)
    np.testing.assert_allclose(scale_m["meu"], scale_1["meu"], rtol=1e-5)
    np.testing.assert_allclose(res_m["z_scores"], res_1["z_scores"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(res_m["anomalies"], res_1["anomalies"])


def test_quantized_checkpoint_roundtrip(model_and_input, tmp_path):
    """save_quantized_checkpoint / load_quantized_checkpoint: the restored
    int8 tree scores bit-identically to the in-memory quantized tree (the
    serve.py int8-boot contract)."""
    core, params, x = model_and_input
    qp = quant.quantize_params(core, params, min_elems=0)
    d = str(tmp_path / "logdir")
    import os

    os.makedirs(d)
    assert not quant.has_quantized_checkpoint(d)
    path = quant.save_quantized_checkpoint(d, qp)
    assert quant.has_quantized_checkpoint(d)
    assert path.endswith("quantized")
    rq = quant.load_quantized_checkpoint(d)
    # identical tree: int8 kernels bit-equal, scales/biases exact
    for a, b in zip(jax.tree_util.tree_leaves(qp), jax.tree_util.tree_leaves(rq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref = quant.call_quantized(core, qp, x)
    got = quant.call_quantized(core, rq, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_quantized_staleness_verdicts(model_and_input, tmp_path):
    """quantized_staleness (shared by the int8 boot and the logdir doctor):
    fresh provenance -> None; a retrained float checkpoint -> content-based
    provenance_mismatch even when mtimes are equalized (the cp -p / rsync -a
    case a pure-mtime check misses)."""
    import json
    import os

    core, params, _ = model_and_input
    qp = quant.quantize_params(core, params, min_elems=0)
    d = str(tmp_path / "logdir")
    os.makedirs(os.path.join(d, "encoder"))
    os.makedirs(os.path.join(d, "decoder"))
    for sub, ts in (("encoder", 100), ("decoder", 100)):
        with open(os.path.join(d, sub, "_CHECKPOINT_METADATA"), "w") as f:
            json.dump({"commit_timestamp_nsecs": ts}, f)
    quant.save_quantized_checkpoint(d, qp)
    assert quant.quantized_staleness(d) is None

    # "retrain": the float commit stamps change; freeze every mtime to the
    # same instant so only content evidence can catch it
    for sub in ("encoder", "decoder"):
        with open(os.path.join(d, sub, "_CHECKPOINT_METADATA"), "w") as f:
            json.dump({"commit_timestamp_nsecs": 999}, f)
    for r, _dirs, fs in os.walk(d):
        for f in fs:
            os.utime(os.path.join(r, f), (1000.0, 1000.0))
    verdict = quant.quantized_staleness(d)
    assert verdict is not None and verdict[0] == "provenance_mismatch"

    # no provenance, no commit stamps anywhere: mtimes are the last resort
    os.remove(os.path.join(d, "quantized", quant.PROVENANCE_FILE))
    for sub in ("encoder", "decoder"):
        os.remove(os.path.join(d, sub, "_CHECKPOINT_METADATA"))
    with open(os.path.join(d, "encoder", "weights.bin"), "w") as f:
        f.write("x")
    os.utime(os.path.join(d, "encoder", "weights.bin"), (2000.0, 2000.0))
    verdict = quant.quantized_staleness(d)
    assert verdict is not None and verdict[0] == "mtime_older"


def test_serving_forward_accepts_pre_quantized(model_and_input):
    """serving_forward(qparams=...) must not touch the float params at all
    (the int8 boot passes params=None)."""
    core, params, x = model_and_input
    qp = quant.quantize_params(core, params, min_elems=0)
    fwd, serve_params = quant.serving_forward(core, None, quantize=True, qparams=qp)
    got = fwd(serve_params, x)
    want = quant.call_quantized(core, qp, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
