"""Streaming engine: scorer math parity, CL, recording, state machine."""

import os
import time

import numpy as np
import pytest


def _numpy_reference_scorer(frames, recs, alpha):
    """Step-by-step numpy transcription of the reference's scoring block
    (camera_streamer_qt.py:1366-1400) for parity validation."""
    min_ema = 0.0
    max_ema = 0.0
    sum_ma = None
    sum2_ma = None
    as_sum = 0.0
    as_sum2 = 0.0
    outs = []
    for img, rec in zip(frames, recs):
        err = np.sum((img - rec) ** 2, axis=-1)
        e_min, e_max = float(err.min()), float(err.max())
        max_ema = alpha * max_ema + (1 - alpha) * e_max
        min_ema = alpha * min_ema + (1 - alpha) * e_min
        norm = (err - min_ema) / (max_ema - min_ema)
        s = err * 1.0
        if sum_ma is None:
            sum_ma = s
        if sum2_ma is None:
            sum2_ma = s**2
        sum_ma = alpha * sum_ma + (1 - alpha) * s
        sum2_ma = alpha * sum2_ma + (1 - alpha) * s**2
        var = np.abs(sum2_ma - sum_ma**2)
        z = (s - sum_ma) / np.sqrt(var + 1e-10)
        zz = (z - z.mean()) / z.std()
        count = float(np.sum(zz > 3.0))
        as_sum = alpha * as_sum + (1 - alpha) * count
        as_sum2 = alpha * as_sum2 + (1 - alpha) * count**2
        a_var = as_sum2 - as_sum**2
        with np.errstate(invalid="ignore"):
            score = (count - as_sum) / np.sqrt(a_var)
        outs.append((norm, float(score), count))
    return outs


def test_stream_score_matches_reference_math():
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import stream_score

    rng = np.random.RandomState(0)
    H, W, C = 12, 10, 3
    frames = rng.random((5, H, W, C)).astype(np.float32)
    recs = rng.random((5, H, W, C)).astype(np.float32)
    alpha = 0.9

    ref = _numpy_reference_scorer(frames, recs, alpha)
    state = stream_score.init_state(H, W)
    for i in range(5):
        state, norm, score, count = stream_score.stream_score_step_reference(
            state, jnp.asarray(frames[i]), jnp.asarray(recs[i]), alpha
        )
        ref_norm, ref_score, ref_count = ref[i]
        np.testing.assert_allclose(np.asarray(norm), ref_norm, rtol=1e-4, atol=1e-5)
        # zz > 3 is a hard threshold: f32-vs-f64 noise can flip boundary
        # pixels, so allow a small count delta
        assert abs(float(count) - ref_count) <= 2, (float(count), ref_count)
        if np.isnan(ref_score) or np.isnan(float(score)):
            assert float(count) == pytest.approx(ref_count, abs=2)
        else:
            np.testing.assert_allclose(float(score), ref_score, rtol=5e-2, atol=5e-2)


def test_stream_score_pallas_interpret_matches_jnp():
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import stream_score

    rng = np.random.RandomState(1)
    H, W, C = 8, 16, 3
    state_a = stream_score.init_state(H, W)
    state_b = stream_score.init_state(H, W)
    old = stream_score._INTERPRET
    stream_score._INTERPRET = True
    try:
        for _ in range(3):
            img = jnp.asarray(rng.random((H, W, C)).astype(np.float32))
            rec = jnp.asarray(rng.random((H, W, C)).astype(np.float32))
            state_a, norm_a, score_a, count_a = stream_score.stream_score_step(
                state_a, img, rec, 0.95
            )
            state_b, norm_b, score_b, count_b = stream_score.stream_score_step_reference(
                state_b, img, rec, 0.95
            )
            np.testing.assert_allclose(np.asarray(norm_a), np.asarray(norm_b), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(state_a.maps), np.asarray(state_b.maps), rtol=1e-5, atol=1e-6)
            assert abs(float(count_a) - float(count_b)) <= 2  # zz boundary flips
    finally:
        stream_score._INTERPRET = old


@pytest.fixture(scope="module")
def engine():
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    model = load_model_from_config(config)
    model.compile()
    settings = {
        "anomaly_score_threshold": 2.0,
        "anomaly_score_method": "zz_count",
        "buffer_record_period_s": 1.0,
        "anomalous_state_period_s": 0.05,
    }
    eng = StreamingEngine(model, config, anomaly_settings=settings)
    eng.inference_period_ms = 0.0
    return eng


def test_engine_process_and_state_machine(engine):
    """Static scene + noise -> injected blob must raise pixel counts and
    trip the anomalous-state machine. (The scorer's z is capped at
    sqrt(alpha/(1-alpha)), so alpha must be ~0.99 for zz to exceed 3 —
    matching the reference's default stream_error_ma.)"""
    from trustedai_cl_vae_ad_tpu.stream.capture import SyntheticSource

    src = SyntheticSource(
        width=24, height=20, n_frames=60, anomaly_frames=range(50, 54), motion=0.0
    )
    counts = []
    anomalous_seen = False
    for i, frame in enumerate(src):
        r = engine.process_frame(frame)
        assert r is not None
        counts.append(r.pixel_count)
        assert r.norm_err_u8.shape == (16, 16)
        assert r.reconstruction_u8.shape == (16, 16, 3)
        if r.anomalous:
            anomalous_seen = True
    steady = np.mean(counts[40:50])
    burst = np.max(counts[50:54])
    assert burst > steady, (steady, burst)
    assert burst >= 1.0
    assert anomalous_seen


def test_engine_cl_step_updates_params(engine):
    import jax

    engine.enable_cont_learning = True
    engine._last_cl_t = 0.0
    engine.continuous_learning_period_ms = 0.0
    before = jax.tree_util.tree_leaves(engine.model.params)[0].copy()
    frame = np.random.RandomState(3).randint(0, 255, (20, 24, 3), np.uint8)
    r = engine.process_frame(frame)
    engine.enable_cont_learning = False
    assert r.cl_stepped
    assert r.loss is not None and "anomaly_score" in r.loss
    after = jax.tree_util.tree_leaves(engine.model.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert engine.cl_epochs >= 1
    assert engine.model_changed_flag


def test_engine_lr_and_noise_dials(engine):
    engine.set_learning_rate(3.3e-4)
    assert abs(engine.model.learning_rate - 3.3e-4) < 1e-9
    engine.set_img_noise(0.05)
    assert abs(engine.model.beta - 0.05) < 1e-9


def test_engine_recording_and_labels(engine, tmp_path):
    rec_dir = tmp_path / "recordings"
    rec_dir.mkdir()
    engine.record_period_ms = 0.0
    engine.begin_recording(str(rec_dir))
    src_frames = np.random.RandomState(4).randint(0, 255, (3, 20, 24, 3), np.uint8)
    for f in src_frames:
        engine.process_frame(f)
    labels_path = engine.terminate_recording()
    assert labels_path and os.path.exists(labels_path)
    import json

    with open(labels_path) as fh:
        labels = json.load(fh)
    inst = os.path.dirname(labels_path)
    n = len(labels["images"])
    assert n >= 1
    assert len(labels["annotations"]) == n  # per-frame anomaly scores
    for sub in ("frames", "err", "heatmap", "overlay", "rec"):
        assert len(os.listdir(os.path.join(inst, sub))) == n
    assert os.path.isdir(os.path.join(inst, "model", "encoder"))


def test_replay_buffer_load(engine, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(5)
    paths = []
    for i in range(3):
        p = tmp_path / f"rb_{i}.png"
        Image.fromarray(rng.randint(0, 255, (20, 24, 3), np.uint8)).save(p)
        paths.append(str(p))
    csv_path = tmp_path / "replay.csv"
    csv_path.write_text("\n".join(paths) + "\n")
    n = engine.load_replay_buffer_from_file(str(csv_path))
    assert n == 3
    # buffer is padded to the fixed capacity; only replay_n rows are valid
    assert engine.replay_buffer.shape == (engine.replay_capacity, 16, 16, 3)
    assert engine.replay_n == 3
    # CL step with replay stacked
    engine.enable_cont_learning = True
    engine._last_cl_t = 0.0
    r = engine.process_frame(rng.randint(0, 255, (20, 24, 3), np.uint8))
    engine.enable_cont_learning = False
    assert r.cl_stepped
    engine.replay_buffer = None
    engine.replay_n = 0
    engine.replay_buffer_paths = None


def test_replay_resize_does_not_retrace(engine, tmp_path):
    """Loading replay buffers of different sizes must reuse ONE compiled CL
    step (VERDICT round 1: each distinct replay length was a new jit shape —
    a 90-200 s compile stall mid-stream on the tunneled runtime)."""
    from PIL import Image

    rng = np.random.RandomState(6)

    def load_n(k):
        paths = []
        for i in range(k):
            p = tmp_path / f"rr_{k}_{i}.png"
            Image.fromarray(rng.randint(0, 255, (20, 24, 3), np.uint8)).save(p)
            paths.append(str(p))
        assert engine.load_replay_buffer_from_filelist(paths) == k

    def cl_step():
        engine.enable_cont_learning = True
        engine._last_cl_t = 0.0
        r = engine.process_frame(rng.randint(0, 255, (20, 24, 3), np.uint8))
        engine.enable_cont_learning = False
        assert r.cl_stepped and np.isfinite(r.loss["loss"])

    load_n(2)
    cl_step()
    cache_after_first = engine._cl_step_j._cache_size()
    load_n(9)  # different replay size: same padded shape, no retrace
    cl_step()
    assert engine._cl_step_j._cache_size() == cache_after_first
    engine.replay_buffer = None
    engine.replay_n = 0
    engine.replay_buffer_paths = None


def test_cl_metrics_persisted(engine, tmp_path):
    """Every CL epoch's loss dict + anomaly scores land in metrics.jsonl
    (reference TensorBoard CallbackList, camera_streamer_qt.py:1410-1416)."""
    import json

    from trustedai_cl_vae_ad_tpu.utils.metrics import MetricsWriter

    rng = np.random.RandomState(7)
    mdir = tmp_path / "metrics"
    with MetricsWriter(str(mdir), use_tensorboard=False) as mw:
        engine.metrics = mw
        engine.enable_cont_learning = True
        engine._last_cl_t = 0.0
        engine.process_frame(rng.randint(0, 255, (20, 24, 3), np.uint8))
        engine.enable_cont_learning = False
        engine.metrics = None
    lines = [json.loads(l) for l in (mdir / "metrics.jsonl").read_text().splitlines()]
    assert lines, "no CL metrics written"
    rec = lines[-1]
    assert "cl/loss" in rec and "cl/anomaly_score" in rec and "cl/anomaly_score_ma" in rec
    assert np.isfinite(rec["cl/loss"])


def test_save_model_with_cam_info(engine, tmp_path):
    engine.cam_info = {"name": "cam0", "url": "rtsp://example", "fps": 20}
    out = engine.save_model_to_dir(str(tmp_path / "saved"))
    from trustedai_cl_vae_ad_tpu.config import load_config

    cfg = load_config(os.path.join(out, "config.yml"))
    assert cfg["cam_info"]["name"] == "cam0"
    assert os.path.isdir(os.path.join(out, "encoder"))


def test_combine_datasets(tmp_path):
    import json

    from trustedai_cl_vae_ad_tpu.stream.engine import combine_datasets

    for name, ids in (("a", [0, 1]), ("b", [0])):
        d = tmp_path / name / "frames"
        d.mkdir(parents=True)
        labels = {"info": {}, "categories": [], "annotations": [],
                  "images": [{"id": i, "width": 4, "height": 4, "file_name": f"{name}{i}.png"} for i in ids]}
        (tmp_path / name / "labels.json").write_text(json.dumps(labels))
    dest = tmp_path / "merged"
    dest.mkdir()
    out = combine_datasets([str(tmp_path / "a"), str(tmp_path / "b")], str(dest))
    with open(out) as f:
        merged = json.load(f)
    assert len(merged["images"]) == 3


def test_combine_datasets_cli(tmp_path):
    """The combine capability must be reachable from the shipped CLI
    (reference GUI action camera_streamer_qt.py:798-850; VERDICT round 1:
    'a capability you can't reach isn't shipped')."""
    import json
    import subprocess
    import sys

    for name, ids in (("a", [0, 1]), ("b", [0, 1, 2])):
        d = tmp_path / name / "frames"
        d.mkdir(parents=True)
        labels = {"info": {}, "categories": [], "annotations": [],
                  "images": [{"id": i, "width": 4, "height": 4, "file_name": f"{name}{i}.png"} for i in ids]}
        (tmp_path / name / "labels.json").write_text(json.dumps(labels))
    dest = tmp_path / "merged"
    env = dict(os.environ, TCVAE_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "camera_streamer.py"),
         "--combine-datasets", str(tmp_path / "a"), str(tmp_path / "b"),
         "--combine-dest", str(dest)],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    with open(dest / "labels.json") as f:
        merged = json.load(f)
    assert len(merged["images"]) == 5


def test_cam_config_validation(tmp_path):
    import yaml

    from trustedai_cl_vae_ad_tpu.stream.engine import load_cam_config

    good = {"camera_list": [{"name": "c", "url": "", "fps": 10}],
            "anomaly_settings": {"anomaly_score_threshold": 2.0, "anomaly_score_method": "m",
                                  "buffer_record_period_s": 1, "anomalous_state_period_s": 5}}
    p = tmp_path / "cam.yml"
    p.write_text(yaml.safe_dump(good))
    cfg = load_cam_config(str(p))
    assert cfg["camera_list"][0]["name"] == "c"
    bad = dict(good, anomaly_settings={"anomaly_score_threshold": 2.0})
    p2 = tmp_path / "bad.yml"
    p2.write_text(yaml.safe_dump(bad))
    with pytest.raises(AssertionError, match="anomaly_settings missing"):
        load_cam_config(str(p2))


def test_ring_seeded_with_first_frame():
    """First frame must fill every ring slot (reference DataQueue behavior,
    camera_streamer_qt.py:67-69) so early CL never trains on zeros."""
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
    eng = StreamingEngine(model, config)
    eng.inference_period_ms = 0.0
    frame = np.full((8, 8, 3), 200, np.uint8)
    eng.process_frame(frame)
    ring = np.asarray(eng.ring)
    expected = 200.0 / 255.0
    assert np.allclose(ring, expected, atol=1e-3), ring.mean(axis=(1, 2, 3))
    # second distinct frame only replaces one slot
    eng.process_frame(np.zeros((8, 8, 3), np.uint8))
    ring = np.asarray(eng.ring)
    near_zero_slots = int(np.sum(ring.mean(axis=(1, 2, 3)) < 0.01))
    assert near_zero_slots == 1


def test_cdf_threshold_per_task(engine):
    """anomaly_score_method 'cdf': threshold comes from the per-task score
    CDF once warm, and new_task() resets it (BASELINE config #3)."""
    fixed = float(engine.anomaly_settings["anomaly_score_threshold"])
    engine.anomaly_settings = dict(
        engine.anomaly_settings, anomaly_score_method="cdf", cdf_quantile=0.9,
        cdf_floor=0.0,  # observe the raw adaptive value below
    )
    engine.new_task()
    # cold: ABSTAIN (+inf) while the per-task CDF warms — falling back to
    # the fixed threshold during the post-switch re-seeding storm measured
    # as the boundary false-alarm source (QUALITY_r5 -> r6)
    assert engine.current_threshold() == float("inf")
    engine.anomaly_settings["cdf_warmup_abstain"] = False
    assert engine.current_threshold() == pytest.approx(fixed)  # opt-out
    rng = np.random.RandomState(0)
    engine._score_history.extend(rng.normal(0.0, 1.0, 200).tolist())
    engine._cdf_dirty = 99
    thr = engine.current_threshold()
    # ~90th percentile of N(0,1) is ~1.28; the histogram CDF returns the
    # right edge of the covering bin, so allow one bin of slack
    assert 0.9 < thr < 2.3, thr
    # default floor = the configured fixed threshold: the adaptive value
    # can only RAISE the operator's threshold, never undercut it
    engine.anomaly_settings.pop("cdf_floor")
    engine._cdf_dirty = 99
    assert engine.current_threshold() == pytest.approx(max(thr, fixed))
    engine.new_task()
    assert len(engine._score_history) == 0
    assert engine.current_threshold() == pytest.approx(fixed)  # abstain off
    engine.anomaly_settings = dict(engine.anomaly_settings, anomaly_score_method="zz_count")


def test_pipelined_mode_lags_one_frame():
    """pipelined=True returns frame N-1's result when frame N is submitted;
    the sequence matches the unpipelined engine shifted by one."""
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
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(5)]

    def run(pipelined):
        model = load_model_from_config(config)
        model.compile()
        eng = StreamingEngine(model, config, pipelined=pipelined)
        eng.inference_period_ms = 0.0
        out = [eng.process_frame(f) for f in frames]
        if pipelined:
            out.append(eng.flush())
        return [r.pixel_count if r else None for r in out], [
            r.norm_err_u8.sum() if r else None for r in out
        ]

    counts_a, sums_a = run(False)
    counts_b, sums_b = run(True)
    assert counts_b[0] is None  # warmup
    assert counts_b[1:] == counts_a  # shifted by one, flush returns the last
    assert sums_b[1:] == sums_a


def test_opencv_source_video_file(tmp_path):
    """OpenCVSource plays a video file (the reference's local-stream path)."""
    cv2 = pytest.importorskip("cv2")

    from trustedai_cl_vae_ad_tpu.stream.capture import OpenCVSource, make_source

    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    rng = np.random.RandomState(0)
    for _ in range(5):
        writer.write(rng.randint(0, 255, (24, 32, 3), np.uint8))
    writer.release()

    src = make_source(path, fps=10)
    assert isinstance(src, OpenCVSource)
    frames = list(src)
    src.release()
    assert len(frames) == 5
    assert frames[0].shape == (24, 32, 3)


def test_engine_timings_populated(engine):
    """Per-phase timing EMA (reference process_rate, :1111-1139 parity)."""
    frame = np.random.RandomState(9).randint(0, 255, (20, 24, 3), np.uint8)
    engine.process_frame(frame)
    assert set(engine.timings) == {"infer_s", "cl_s", "record_s", "total_s"}
    assert engine.timings["total_s"] > 0
    assert engine.process_rate > 0


def test_recorded_overlay_blends_input_frame(engine, tmp_path):
    """Overlay stream = 0.5*jet(err) + 0.5*model-sized INPUT frame, per
    reference camera_streamer_qt.py:1420 (NOT the reconstruction)."""
    from PIL import Image

    from trustedai_cl_vae_ad_tpu.viz.plots import overlay_heatmap

    rec_dir = tmp_path / "rec_overlay"
    rec_dir.mkdir()
    engine.record_period_ms = 0.0
    engine.begin_recording(str(rec_dir))
    frame = np.random.RandomState(8).randint(0, 255, (20, 24, 3), np.uint8)
    result = engine.process_frame(frame)
    inst = engine.record_instance_dir
    engine.terminate_recording()
    (name,) = os.listdir(os.path.join(inst, "overlay"))
    got = np.asarray(Image.open(os.path.join(inst, "overlay", name)))
    base = np.asarray(
        Image.fromarray(frame).resize((engine.width, engine.height), Image.BILINEAR)
    )
    want = overlay_heatmap(result.norm_err_u8, base)
    np.testing.assert_array_equal(got, want)


def test_schedule_model_save_semantics(engine, tmp_path):
    """Reference :915-923, :991-1008: schedule_model_save saves at the next
    tick IFF dirty (the flag is consumed either way); the override variant
    forces the save even when clean."""
    cache = tmp_path / "cache"
    cache.mkdir()
    engine.model_cache_dir = str(cache)
    engine.enable_cont_learning = False  # a CL step would dirty the model
    engine.model_changed_flag = False
    engine.schedule_model_save_flag = False
    engine.autosave_period_s = 1e9
    frame = np.random.RandomState(9).randint(0, 255, (20, 24, 3), np.uint8)
    engine.process_frame(frame)
    assert not os.path.exists(cache / "encoder")  # nothing scheduled

    engine.schedule_model_save()  # clean model: consumed, no save
    engine.process_frame(frame)
    assert not os.path.exists(cache / "encoder")
    assert engine.schedule_model_save_flag is False

    engine.schedule_model_save_override()  # forced: saves even when clean
    engine.process_frame(frame)
    assert os.path.isdir(cache / "encoder")
    assert engine.schedule_model_save_flag is False
    assert engine.model_changed_flag is False
    engine.model_cache_dir = None


def test_state_machine_honors_injected_clock(engine):
    """Hold-period expiry must run on the same clock as the injected `now` —
    a replayed stream with simulated timestamps must not wait wall time."""
    hold = float(engine.anomaly_settings["anomalous_state_period_s"])
    # own the precondition: a prior test may have latched the state on the
    # WALL clock (module-scoped engine), which must not leak into this
    # simulated-clock scenario
    engine.anomalous_state = False
    engine.anomalous_start_time = None
    engine.toggle_anomalous_state(True, now=100.0)
    assert engine.anomalous_state
    engine.anomaly_score = -1e9  # below any threshold
    engine.check_anomalous_state(now=100.0 + hold / 2)
    assert engine.anomalous_state  # inside the hold period
    engine.check_anomalous_state(now=100.0 + hold + 0.01)
    assert not engine.anomalous_state  # expired on the injected clock


def test_paced_reader_mixed_fps():
    """PacedReader samples each source at its own fps relative to the tick
    rate: a 5 fps source in a 20 fps tick loop advances one frame every 4
    ticks (repeating its latest in between), so mixed-fps camera lists don't
    exhaust slower sources early (camera_streamer.py)."""
    from camera_streamer import PacedReader
    from trustedai_cl_vae_ad_tpu.stream.capture import SyntheticSource

    slow = PacedReader(SyntheticSource(width=8, height=8, n_frames=10), 5.0, 20.0)
    fast = PacedReader(SyntheticSource(width=8, height=8, n_frames=10), 20.0, 20.0)
    slow_frames, fast_frames = [], []
    for _ in range(16):
        slow_frames.append(slow.read())
        fast_frames.append(fast.read())
    # fast consumed 10 unique frames then exhausted
    assert fast_frames[9] is not None and fast_frames[10] is None
    # slow bootstraps at tick 1 then advances every 4th tick (4, 8, 12, 16):
    # 5 unique frames over 16 ticks, none None
    assert all(f is not None for f in slow_frames)
    uniques = 1 + sum(
        not np.array_equal(a, b)
        for a, b in zip(slow_frames[1:], slow_frames[:-1])
    )
    assert uniques == 5, uniques
    # repeats are the cached frame, bit-identical
    assert np.array_equal(slow_frames[0], slow_frames[1])


def test_new_task_keeps_scorer_state_by_default(engine):
    """new_task() resets the per-task CDF but KEEPS the scorer EMA state
    (resetting it rails scores at the z-cap for dozens of frames — the
    measured boundary false-alarm storm, benchmarks/cl_quality.py);
    reset_scorer=True forces the hard reset."""
    rng = np.random.RandomState(9)
    for _ in range(4):
        engine.process_frame(rng.randint(0, 255, (20, 24, 3), np.uint8))
    maps_before = np.asarray(engine.score_state.maps).copy()
    assert np.abs(maps_before).max() > 0
    engine._score_history.extend([1.0, 2.0])
    engine.new_task()
    assert len(engine._score_history) == 0
    np.testing.assert_array_equal(np.asarray(engine.score_state.maps), maps_before)
    engine.new_task(reset_scorer=True)
    assert np.abs(np.asarray(engine.score_state.maps)).max() == 0


def test_cdf_warmup_skip_excludes_transition_scores(engine):
    """anomaly_settings['cdf_warmup_skip']: the first K post-new_task scores
    stay out of the CDF history (the task-transition storm must not pin the
    per-task quantile at the z-cap)."""
    engine.anomaly_settings = dict(engine.anomaly_settings, cdf_warmup_skip=3)
    engine.new_task()
    for s in (9.9, 9.9, 9.9, 1.0, 1.1):
        engine._record_score(s)
    assert list(engine._score_history) == [1.0, 1.1]
    engine.anomaly_settings.pop("cdf_warmup_skip")
    engine.new_task()


def test_paced_reader_drains_live_sources():
    """Live sources (is_live) are read on a dedicated drain thread —
    cv2's capture FIFO backs up when read slower than the camera delivers,
    and a blocking read in the tick loop would throttle the fleet to the
    slowest camera. The tick-side read() must (a) never call source.read on
    the calling thread, (b) never block on frame delivery, and (c) hand out
    the NEWEST delivered frame; pacing applies only to replayable sources."""
    import threading

    from camera_streamer import PacedReader
    from trustedai_cl_vae_ad_tpu.stream.capture import SyntheticSource

    class LiveSource(SyntheticSource):
        is_live = True

        def __init__(self):
            super().__init__(width=8, height=8, n_frames=1000)
            self.deliver = threading.Event()  # one frame per .set()
            self.reader_threads = set()

        def read(self):
            # block like a real camera until the next frame is "delivered"
            self.reader_threads.add(threading.get_ident())
            if not self.deliver.wait(timeout=5.0):
                return None
            self.deliver.clear()
            return super().read()

    def poll(predicate, timeout=5.0):
        deadline = time.time() + timeout
        while not predicate():
            if time.time() > deadline:
                raise AssertionError("timed out waiting for drain thread")
            time.sleep(0.005)

    src = LiveSource()
    paced = PacedReader(src, 5.0, 20.0)  # slow fps config on a live source
    try:
        # no frame delivered yet: tick read returns None immediately, does
        # not block, and never touches source.read from this thread
        assert paced.read() is None
        assert threading.get_ident() not in src.reader_threads

        src.deliver.set()
        poll(lambda: paced.read() is not None)
        first = paced.read()
        # between deliveries the same cached frame is repeated
        assert np.array_equal(paced.read(), first)

        src.deliver.set()  # second frame arrives
        poll(lambda: not np.array_equal(paced.read(), first))
        assert src.reader_threads.isdisjoint({threading.get_ident()})
    finally:
        src.deliver.set()  # unblock the drain thread so release can join
        paced.release()


def _tiny_config():
    return {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 8, "layers": [4]},
        "training": {"batch_size": 8, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }


def test_engine_optimizer_is_lazy():
    """An inference-only StreamingEngine must not allocate optimizer moments
    (the flagship's are ~2x the 2.7 GB param bytes): compile happens on the
    first CL use / lr dial, not at construction."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = _tiny_config()
    model = load_model_from_config(config)
    eng = StreamingEngine(model, config)
    eng.inference_period_ms = 0.0
    assert model.optimizer is None  # construction allocated no Adam state
    rng = np.random.RandomState(0)
    for _ in range(3):
        eng.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    assert model.optimizer is None  # inference ticks still don't
    eng.set_learning_rate(5e-4)  # the CL dial compiles on demand
    assert model.optimizer is not None
    assert eng.model.learning_rate == pytest.approx(5e-4)
    # and CL actually steps on the lazily-built path
    eng.enable_cont_learning = True
    eng.continuous_learning_period_ms = 0.0
    out = eng.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    assert out.cl_stepped and out.loss is not None


def test_engine_int8_checkpoint_boot(tmp_path, monkeypatch):
    """load_engine_from_directory(quantize=True, int8_checkpoint_boot=True)
    boots from <logdir>/quantized without materializing float params and
    scores bit-identically to the quantize-at-load engine; CL controls raise
    (inference-only boot)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.ops import quant
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import load_engine_from_directory

    monkeypatch.setenv("TCVAE_QUANT_MIN_ELEMS", "0")
    config = _tiny_config()
    d = str(tmp_path / "m")
    os.makedirs(d)
    model = load_model_from_config(config)
    model.save_model(d, include_optimizer=False)
    save_config(config, os.path.join(d, "config.yml"))

    ref = load_engine_from_directory(d, quantize=True)  # quantize-at-load
    assert ref.model.params is not None
    qp = quant.quantize_params(model.core, model.params)
    quant.save_quantized_checkpoint(d, qp)
    int8 = load_engine_from_directory(d, quantize=True, int8_checkpoint_boot=True)
    assert int8.model.params is None  # float tree never materialized
    ref.inference_period_ms = int8.inference_period_ms = 0.0

    rng = np.random.RandomState(7)
    for _ in range(4):
        f = rng.randint(0, 255, (16, 16, 3), np.uint8)
        r_ref, r_int8 = ref.process_frame(f), int8.process_frame(f)
        for a, b in ((r_ref.score, r_int8.score),
                     (r_ref.pixel_count, r_int8.pixel_count)):
            if np.isnan(a):
                assert np.isnan(b)
            else:
                assert a == b  # same int8 tree -> bit-identical dispatch

    with pytest.raises(RuntimeError, match="int8 checkpoint"):
        int8.set_learning_rate(1e-3)
    int8.enable_cont_learning = True
    int8.continuous_learning_period_ms = 0.0
    with pytest.raises(RuntimeError, match="int8 checkpoint"):
        int8.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    int8.enable_cont_learning = False

    # recording on an int8 boot must not crash at terminate (the model
    # snapshot re-persists the QUANTIZED tree) and the snapshot is loadable
    # by the int8-boot path
    rec = str(tmp_path / "rec")
    os.makedirs(rec)
    int8.record_period_ms = 0.0
    int8.begin_recording(rec)
    for _ in range(2):
        int8.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    labels_path = int8.terminate_recording()
    assert labels_path and os.path.exists(labels_path)
    snap = os.path.join(os.path.dirname(labels_path), "model")
    assert quant.has_quantized_checkpoint(snap)
    again = load_engine_from_directory(snap, quantize=True,
                                       int8_checkpoint_boot=True)
    r = again.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    assert r is None or np.isfinite(r.pixel_count)


def test_multicam_int8_checkpoint_boot(tmp_path, monkeypatch):
    """MultiCameraEngine(qparams=...) serves from a pre-quantized tree with
    model.params=None; fleet-CL controls raise."""
    import os
    from types import SimpleNamespace

    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.ops import quant
    from trustedai_cl_vae_ad_tpu.registry import (
        build_core_from_config,
        load_model_from_config,
    )
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    monkeypatch.setenv("TCVAE_QUANT_MIN_ELEMS", "0")
    config = _tiny_config()
    d = str(tmp_path / "m")
    os.makedirs(d)
    model = load_model_from_config(config)
    model.save_model(d, include_optimizer=False)
    save_config(config, os.path.join(d, "config.yml"))
    qp = quant.quantize_params(model.core, model.params)
    quant.save_quantized_checkpoint(d, qp)

    ref = MultiCameraEngine(model, config, n_streams=2, quantize=True)
    shell = SimpleNamespace(core=build_core_from_config(config),
                            params=None, optimizer=None)
    int8 = MultiCameraEngine(shell, config, n_streams=2,
                             qparams=quant.load_quantized_checkpoint(d))
    assert int8.quantized  # qparams alone selects the int8 forward

    rng = np.random.RandomState(9)
    for t in range(3):
        tick = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
        out_ref = ref.process_frames(tick, now=float(t))
        out_int8 = int8.process_frames(tick, now=float(t))
        for a, b in zip(out_ref, out_int8):
            if np.isnan(a.score):
                assert np.isnan(b.score)
            else:
                assert a.score == b.score

    with pytest.raises(RuntimeError, match="int8 checkpoint"):
        int8.set_learning_rate(1e-3)
    int8.enable_cont_learning = True
    with pytest.raises(RuntimeError, match="int8 checkpoint"):
        int8.process_frames([tick[0], tick[1]], now=99.0)


def test_paced_reader_reports_drain_thread_death():
    """A live source whose read() starts failing (or that exhausts) must end
    the stream — not freeze it on the last good frame forever: the drain
    thread records its death and PacedReader.read() returns None."""
    import threading

    from camera_streamer import PacedReader
    from trustedai_cl_vae_ad_tpu.stream.capture import SyntheticSource

    class FlakySource(SyntheticSource):
        is_live = True

        def __init__(self):
            super().__init__(width=8, height=8, n_frames=1000)
            self.deliver = threading.Event()
            self.fail = False

        def read(self):
            if not self.deliver.wait(timeout=5.0):
                return None
            self.deliver.clear()
            if self.fail:
                raise RuntimeError("camera unplugged")
            return super().read()

    src = FlakySource()
    paced = PacedReader(src, 20.0, 20.0)

    def poll(predicate, timeout=5.0):
        deadline = time.time() + timeout
        while not predicate():
            if time.time() > deadline:
                raise AssertionError("timed out")
            time.sleep(0.005)

    try:
        src.deliver.set()
        poll(lambda: paced.read() is not None)
        src.fail = True
        src.deliver.set()  # next drain read raises -> thread dies
        poll(lambda: paced.read() is None)  # stream reports ended, not frozen
    finally:
        src.deliver.set()
        paced.release()


def test_pipelined_tag_tracks_skipped_frames(engine):
    """FrameResult.tag identifies the SCORED frame even when the inference
    hold-off skips submissions: stats rows must never attribute a score to
    a frame that was never dispatched."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    model = engine.model
    eng = StreamingEngine(model, engine.config, pipelined=True)
    eng.inference_period_ms = 40.0  # hold-off: some frames skipped
    rng = np.random.RandomState(2)
    emitted = []
    # drive with an injected clock: frames arrive every 25 ms, so every
    # other frame falls inside the hold-off window and is skipped
    for i in range(8):
        now = i * 0.025
        r = eng.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8),
                              now=now, tag=i)
        if r is not None:
            emitted.append(r.tag)
    last = eng.flush()
    if last is not None:
        emitted.append(last.tag)
    # the 40 ms hold-off (clock starts at 0) admits frames 2, 4, 6 only;
    # results lag one submission: emitted tags are exactly the submitted
    # frames, in order, none fabricated — a naive "frame n-1" label would
    # have reported 3, 5, 7
    assert emitted == [2, 4, 6], emitted


def test_warmup_compiles_without_touching_state(engine):
    """engine.warmup() pre-compiles (lower().compile()) the dispatch and
    optionally the CL step WITHOUT executing: scorer state, ring seeding,
    and CL numerics must be identical to an unwarmed engine fed the same
    frames. 35 frames so the scorer EMA leaves its NaN warm-up window
    (first finite score: frame 27 on this config) — the equality assert
    must compare REAL scores, not NaN==NaN."""
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = engine.config
    model = engine.model
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(35)]

    def run(warm):
        eng = StreamingEngine(model, config)
        eng.inference_period_ms = 0.0
        if warm:
            eng.warmup()  # native shape, no CL
        return [eng.process_frame(f).score for f in frames]

    a, b = run(True), run(False)
    finite = 0
    for x, y in zip(a, b):
        if np.isnan(x):
            assert np.isnan(y)
        else:
            assert x == y  # bit-identical: warmup executed nothing
            finite += 1
    assert finite > 0, "every score NaN: equivalence was never exercised"


def test_multicam_warmup_pins_shape_and_matches():
    """Warmed == unwarmed bit-identically, for inference AND for CL runs.
    A FRESH (deterministically initialized) model per run: CL trains
    params in place, so sharing one model would make the second run start
    from the first run's weights. 35 ticks so scores leave the scorer's
    NaN warm-up window and real values are compared."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    config = _tiny_config()
    rng = np.random.RandomState(12)
    ticks = [[rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
             for _ in range(35)]

    def run(warm, cl):
        model = load_model_from_config(config)
        eng = MultiCameraEngine(model, config, n_streams=2)
        if cl:
            eng.enable_cont_learning = True
            eng.continuous_learning_period_ms = 0.0
        if warm:
            eng.warmup(cl=cl)
            assert eng._ref_shape == (16, 16, 3)  # provisional pin
        out = []
        for t, tick in enumerate(ticks):
            out.append([r.score for r in eng.process_frames(tick, now=float(t))])
        return out

    for cl in (False, True):
        finite = 0
        for a_row, b_row in zip(run(True, cl), run(False, cl)):
            for x, y in zip(a_row, b_row):
                if np.isnan(x):
                    assert np.isnan(y)
                else:
                    assert x == y, f"cl={cl}"  # warmup executed nothing
                    finite += 1
        assert finite > 0, f"cl={cl}: every score NaN — vacuous comparison"


def test_warmup_on_quantized_engine(engine):
    """warmup() must also pre-compile the int8 dispatch: the serve-params
    tree is the QUANTIZED one under quantize=True, and the lowered signature
    must match what process_frame dispatches (scores == unwarmed int8)."""
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = engine.config
    model = engine.model
    rng = np.random.RandomState(13)
    frames = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(35)]

    def run(warm):
        eng = StreamingEngine(model, config, quantize=True)
        eng.inference_period_ms = 0.0
        if warm:
            eng.warmup()
        return [eng.process_frame(f).score for f in frames]

    finite = 0
    for x, y in zip(run(True), run(False)):
        if np.isnan(x):
            assert np.isnan(y)
        else:
            assert x == y
            finite += 1
    assert finite > 0, "every score NaN: equivalence was never exercised"


def _write_replay_csv(tmp_path, n=3):
    from PIL import Image

    rng = np.random.RandomState(7)
    paths = []
    for i in range(n):
        p = tmp_path / f"warm_rb_{i}.png"
        Image.fromarray(rng.randint(0, 255, (20, 24, 3), np.uint8)).save(p)
        paths.append(str(p))
    csv_path = tmp_path / "warm_replay.csv"
    csv_path.write_text("\n".join(paths) + "\n")
    return str(csv_path)


def test_warmup_cl_lowers_the_replay_shape(tmp_path):
    """With a replay buffer loaded, the CL step only ever runs the
    ring+capacity stacked shape — warmup(cl=True) must lower THAT shape,
    not the ring-only one (which would leave the first real CL step to
    compile). Asserted by spying the lowered stacked aval, then running a
    real CL step through the same signature. Builds its OWN engine: the
    CL step trains params in place and the shared `engine` fixture is
    module-scoped."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = _tiny_config()
    eng = StreamingEngine(load_model_from_config(config), config)
    eng.load_replay_buffer_from_file(_write_replay_csv(tmp_path))
    eng._ensure_cl()
    real = eng._cl_step_j
    lowered = []

    class Spy:
        def lower(self, *a, **k):
            lowered.append(a[2].shape)
            return real.lower(*a, **k)

    eng._cl_step_j = Spy()
    try:
        eng.warmup(cl=True)
    finally:
        eng._cl_step_j = real
    expect = (eng.RING_SIZE + eng.replay_capacity, 16, 16, 3)
    assert lowered == [expect], lowered

    rng = np.random.RandomState(8)
    eng.enable_cont_learning = True
    eng._last_cl_t = 0.0
    eng.inference_period_ms = 0.0
    r = eng.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    assert r.cl_stepped


def test_multicam_warmup_lowers_the_replay_variant(tmp_path):
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    config = _tiny_config()
    model = load_model_from_config(config)
    eng = MultiCameraEngine(model, config, n_streams=2)
    eng.enable_cont_learning = True
    eng.continuous_learning_period_ms = 0.0
    eng.load_replay_buffer_from_file(_write_replay_csv(tmp_path))
    eng._ensure_cl()
    calls = []
    real_r, real_n = eng._cl_step_replay_j, eng._cl_step_j

    class SpyR:
        def lower(self, *a, **k):
            calls.append(("replay", a[3].shape))
            return real_r.lower(*a, **k)

    class SpyN:
        def lower(self, *a, **k):
            calls.append(("no_replay",))
            return real_n.lower(*a, **k)

    eng._cl_step_replay_j, eng._cl_step_j = SpyR(), SpyN()
    try:
        eng.warmup(cl=True)
    finally:
        eng._cl_step_replay_j, eng._cl_step_j = real_r, real_n
    assert calls == [("replay", eng.replay_buffer.shape)], calls

    rng = np.random.RandomState(9)
    out = eng.process_frames(
        [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)],
        now=0.0)
    assert len(out) == 2


def test_record_frame_artifacts_single_channel(tmp_path):
    """1-channel models (image_size [..,..,1]) stream (H,W,1) frames and
    reconstructions; the 5 recording PNG streams must write grayscale
    instead of crashing PIL ('Cannot handle this data type: (1, 1, 1), |u1'),
    including the host-resize path for off-model-size frames."""
    import os

    from PIL import Image

    from trustedai_cl_vae_ad_tpu.stream.engine import record_frame_artifacts

    inst = str(tmp_path / "inst")
    for sub in ("frames", "err", "heatmap", "overlay", "rec"):
        os.makedirs(os.path.join(inst, sub))
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (12, 10, 1), np.uint8)  # != model size: resize
    norm = rng.randint(0, 255, (8, 6), np.uint8)
    rec = rng.randint(0, 255, (8, 6, 1), np.uint8)
    record_frame_artifacts(inst, "f0.png", frame, norm, rec, height=8, width=6)
    for sub, mode in (("frames", "L"), ("err", "L"), ("heatmap", "RGB"),
                      ("overlay", "RGB"), ("rec", "L")):
        img = Image.open(os.path.join(inst, sub, "f0.png"))
        assert img.mode == mode, (sub, img.mode)
