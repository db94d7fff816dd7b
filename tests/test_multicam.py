"""Multi-camera batched engine vs K independent single-stream engines."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 4, "layers": [4]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }
    model = load_model_from_config(config)
    settings = {"anomaly_score_threshold": 2.0, "anomaly_score_method": "zz_count",
                "buffer_record_period_s": 1.0, "anomalous_state_period_s": 0.05}
    return model, config, settings


def test_matches_independent_engines(setup):
    """K batched streams must score identically to K separate engines fed
    the same frames (vmapped jnp scorer == per-stream jnp scorer)."""
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    # the hold-period expiry reads wall clocks inside each engine; under
    # full-suite load the skew between the two engines' clocks can straddle a
    # short hold window and flip the state on one side only — make it
    # effectively infinite so transitions are deterministic for comparison
    settings = dict(settings, anomalous_state_period_s=1e9)
    K, T = 3, 25
    rngs = [np.random.RandomState(10 + i) for i in range(K)]
    frames = [[r.randint(0, 255, (20, 24, 3), np.uint8) for _ in range(T)]
              for r in rngs]

    singles = []
    for _ in range(K):
        e = StreamingEngine(model, config, anomaly_settings=dict(settings))
        e.inference_period_ms = 0.0
        singles.append(e)
    multi = MultiCameraEngine(model, config, n_streams=K,
                              anomaly_settings=dict(settings))

    for t in range(T):
        tick = [frames[i][t] for i in range(K)]
        multi_out = multi.process_frames(tick)
        for i in range(K):
            single_out = singles[i].process_frame(frames[i][t])
            m, s = multi_out[i], single_out
            if np.isnan(s.score):
                assert np.isnan(m.score), (t, i)
            else:
                np.testing.assert_allclose(m.score, s.score, rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(m.pixel_count, s.pixel_count, atol=0.5)
            # vmapped vs per-stream reduction order can flip a 0.5-ulp
            # rounding boundary on isolated pixels of the uint8 map
            diff = np.abs(m.norm_err_u8.astype(int) - s.norm_err_u8.astype(int))
            assert diff.max() <= 1 and (diff > 0).mean() < 0.01, (t, i)
            assert m.anomalous == s.anomalous, (t, i)


def test_dropped_frames_freeze_state(setup):
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=settings)
    rng = np.random.RandomState(0)
    f = lambda: rng.randint(0, 255, (16, 16, 3), np.uint8)
    for _ in range(5):
        multi.process_frames([f(), f()])
    maps_before = np.asarray(multi.maps[1]).copy()
    out = multi.process_frames([f(), None])
    assert out[0] is not None and out[1] is None
    np.testing.assert_array_equal(np.asarray(multi.maps[1]), maps_before)
    # stream 0 kept updating
    assert not np.array_equal(np.asarray(multi.maps[0]), maps_before)


def test_reset_stream(setup):
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=settings)
    rng = np.random.RandomState(1)
    for _ in range(4):
        multi.process_frames([rng.randint(0, 255, (16, 16, 3), np.uint8)] * 2)
    assert np.abs(np.asarray(multi.maps[0])).max() > 0
    multi.reset_stream(0)
    assert np.abs(np.asarray(multi.maps[0])).max() == 0
    assert np.abs(np.asarray(multi.maps[1])).max() > 0


def test_per_stream_cdf_threshold(setup):
    """anomaly_score_method 'cdf' keeps one CDF PER STREAM, and new_task(i)
    resets only stream i's history/threshold (engine parity, per stream)."""
    import pytest

    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    # cdf_floor=0 observes the raw per-stream adaptive value; abstain off
    # exercises the fixed-threshold fallback (default policy is covered by
    # the single-stream engine test — the knobs are shared)
    settings = dict(settings, anomaly_score_method="cdf", cdf_quantile=0.9,
                    cdf_floor=0.0, cdf_warmup_abstain=False)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=settings)
    fixed = float(settings["anomaly_score_threshold"])
    # cold with abstain opted out: both streams fall back to the fixed
    # threshold (default abstains at +inf until the per-task CDF is warm)
    assert multi.current_threshold(0) == pytest.approx(fixed)
    assert multi.current_threshold(1) == pytest.approx(fixed)
    settings_abstain = dict(settings, cdf_warmup_abstain=True)
    multi.anomaly_settings = settings_abstain
    assert multi.current_threshold(0) == float("inf")
    multi.anomaly_settings = settings
    rng = np.random.RandomState(0)
    multi._score_history[0].extend(rng.normal(0.0, 1.0, 200).tolist())
    multi._score_history[1].extend(rng.normal(10.0, 1.0, 200).tolist())
    multi._cdf_dirty = [99, 99]
    thr0, thr1 = multi.current_threshold(0), multi.current_threshold(1)
    assert 0.9 < thr0 < 2.3, thr0  # ~q90 of N(0,1) + one histogram bin
    assert 10.9 < thr1 < 12.3, thr1  # stream 1's own distribution
    multi.new_task(0)
    assert len(multi._score_history[0]) == 0
    assert multi.current_threshold(0) == pytest.approx(fixed)
    # stream 1 untouched
    assert multi.current_threshold(1) == pytest.approx(thr1)


def test_host_resize_single_channel(setup):
    """_host_resize handles (H, W, 1) frames (PIL rejects them raw) and
    RGB -> single-channel conversion instead of crashing the tick."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    multi = MultiCameraEngine(model, config, n_streams=1,
                              anomaly_settings=settings)
    gray1 = np.random.RandomState(0).randint(0, 255, (8, 8, 1), np.uint8)
    out = multi._host_resize(0, gray1, (16, 16, 3))
    assert out.shape == (16, 16, 3)
    assert (out[..., 0] == out[..., 1]).all()  # replicated luminance
    rgb = np.random.RandomState(1).randint(0, 255, (8, 8, 3), np.uint8)
    out = multi._host_resize(0, rgb, (16, 16, 1))
    assert out.shape == (16, 16, 1)


def test_mixed_resolution_streams(setup):
    """camera_list entries need not share a resolution: the batch shape is
    pinned at the first tick and mismatched streams are resized on host.
    The resized stream must score like a stream natively delivering the
    resized frames."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine
    from PIL import Image

    model, config, settings = setup
    eng = MultiCameraEngine(model, config, n_streams=2,
                            anomaly_settings=dict(settings))
    ref = MultiCameraEngine(model, config, n_streams=2,
                            anomaly_settings=dict(settings))
    rng = np.random.RandomState(3)
    for t in range(4):
        f0 = rng.randint(0, 255, (20, 24, 3), np.uint8)
        f1_big = rng.randint(0, 255, (40, 48, 3), np.uint8)
        out = eng.process_frames([f0, f1_big], now=float(t))
        assert out[0] is not None and out[1] is not None
        f1_small = np.asarray(
            Image.fromarray(f1_big).resize((24, 20), Image.BILINEAR), np.uint8)
        want = ref.process_frames([f0, f1_small], now=float(t))
        # warm-up ticks score nan on both sides (EMA stats not yet seeded)
        np.testing.assert_allclose(out[1].score, want[1].score,
                                   atol=1e-5, equal_nan=True)
    assert eng._ref_shape == (20, 24, 3)


# ---------------------------------------------------------------- fleet CL

def _fresh_model(config):
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    return load_model_from_config(config)


def test_cl_step_matches_manual(setup):
    """Fleet CL = ONE gradient step on the union ring: the params after the
    engine's CL step must equal a hand-built optax step on the stacked
    (ticks x streams) batch with the same rng."""
    import jax
    import jax.numpy as jnp
    import optax
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model_a = _fresh_model(config)  # CL mutates weights: never the shared model
    model_b = _fresh_model(config)

    multi = MultiCameraEngine(model_a, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2)
    multi.enable_cont_learning = True

    rng = np.random.RandomState(7)
    ticks = [[rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
             for _ in range(3)]
    # period 500 ms: ticks at 0.1/0.2 only fill the ring; tick at 1.0 fires CL
    multi.process_frames(ticks[0], now=0.1)
    multi.process_frames(ticks[1], now=0.2)
    multi.process_frames(ticks[2], now=1.0)
    assert multi.cl_epochs == 1
    assert np.isfinite(multi.last_epoch_loss["loss"])

    # manual step on the same model init (same config -> same seeded params)
    model_b.compile()
    rng_b = model_b._next_rng()  # draw #2, same as the engine's CL draw
    # ring slots at CL time: slot0 = tick2 (overwrote tick0), slot1 = tick1
    stacked = jnp.asarray(np.stack(ticks[2] + ticks[1]).astype(np.float32) / 255.0)
    weights = jnp.ones(4, jnp.float32)
    core, opt = model_b.core, model_b.optimizer

    def loss_fn(p):
        ld, _ = core.compute_loss(p, stacked, training=True, return_inf=True,
                                  rng=rng_b, weights=weights)
        return ld["loss"], ld

    grads, ld = jax.grad(loss_fn, has_aux=True)(model_b.params)
    updates, _ = opt.update(grads, model_b.opt_state, model_b.params)
    want = optax.apply_updates(model_b.params, updates)

    np.testing.assert_allclose(
        float(ld["loss"]), multi.last_epoch_loss["loss"], rtol=1e-5)
    got_leaves = jax.tree_util.tree_leaves(multi.model.params)
    want_leaves = jax.tree_util.tree_leaves(want)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-6)


def test_cl_masks_dropped_streams(setup):
    """Dropped frames carry weight 0: CL on [frame, None] ticks is finite and
    steps the weights; an all-dropped ring never steps at all."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2)
    multi.enable_cont_learning = True

    # all-dropped ticks: the CL cadence fires but no step happens
    multi.process_frames([None, None], now=1.0)
    assert multi.cl_epochs == 0 and multi.last_epoch_loss is None

    rng = np.random.RandomState(8)
    f = lambda: rng.randint(0, 255, (16, 16, 3), np.uint8)
    multi.process_frames([f(), None], now=1.1)
    multi.process_frames([f(), None], now=2.0)  # fires with half the rows
    assert multi.cl_epochs == 1
    assert np.isfinite(multi.last_epoch_loss["loss"])


def test_cl_learns_static_fleet(setup):
    """Shared weights actually fit the union of scenes: loss drops over CL
    steps on two static (different) camera scenes, and the post-CL serving
    forward reflects the trained weights (serve-params refresh)."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2)
    multi.enable_cont_learning = True
    multi.set_learning_rate(1e-3)

    rng = np.random.RandomState(9)
    scene = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
    losses = []
    for t in range(12):
        multi.process_frames(list(scene), now=float(t))  # period 500ms -> fires each tick
        if multi.last_epoch_loss is not None:
            losses.append(multi.last_epoch_loss["loss"])
    assert len(losses) >= 10
    assert losses[-1] < losses[0], losses


def test_cl_quantized_serving_refresh(setup):
    """CL with the int8 serving path: the float weights train, the serving
    copy re-quantizes after each step, and scoring keeps working."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2,
                              quantize=True)
    multi.enable_cont_learning = True
    rng = np.random.RandomState(11)
    f = lambda: rng.randint(0, 255, (16, 16, 3), np.uint8)
    import jax

    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(multi._serve_params)]
    out = None
    for t in range(3):
        out = multi.process_frames([f(), f()], now=float(t))
    assert multi.cl_epochs >= 1
    after = jax.tree_util.tree_leaves(multi._serve_params)
    assert any(not np.array_equal(b, np.asarray(a))
               for b, a in zip(before, after))
    assert out[0] is not None and out[0].norm_err_u8.shape == (16, 16)


def test_cl_autosave_roundtrip(setup, tmp_path):
    """Fleet-CL-trained weights persist: the autosave cycle saves iff dirty
    (consuming the schedule flag), and the saved dir is loadable through the
    standard registry with the trained params."""
    import jax
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    cache = str(tmp_path / "cache")
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2,
                              model_cache_dir=cache, autosave_period_s=1.0)
    multi.enable_cont_learning = True

    rng = np.random.RandomState(12)
    f = lambda: rng.randint(0, 255, (16, 16, 3), np.uint8)
    multi.process_frames([f(), f()], now=0.1)  # arms the autosave timer
    multi.process_frames([f(), f()], now=1.0)  # fires CL (dirty)
    assert multi.cl_epochs >= 1 and multi.model_changed_flag
    multi.process_frames([f(), f()], now=1.5)  # period elapsed -> autosave
    assert not multi.model_changed_flag  # consumed by a successful save

    loaded, _ = load_model_from_directory(cache)
    for g, w in zip(jax.tree_util.tree_leaves(loaded.params),
                    jax.tree_util.tree_leaves(multi.model.params)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32), atol=1e-6)

    # clean model: the schedule flag is consumed without writing
    multi.schedule_model_save()
    multi.process_frames([f(), f()], now=1.6)
    assert not multi.schedule_model_save_flag


def test_cl_replay_buffer(setup, tmp_path):
    """Fleet CL with a replay buffer: the step must equal a hand-built optax
    step on [ring-rows ++ replay-rows] with padded replay slots at weight 0,
    loaded through the same txt-file format as the single-stream engine."""
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model_a = _fresh_model(config)
    model_b = _fresh_model(config)

    rng = np.random.RandomState(13)
    replay_imgs = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(3)]
    paths = []
    for i, img in enumerate(replay_imgs):
        p = str(tmp_path / f"replay{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    listfile = str(tmp_path / "replay.txt")
    with open(listfile, "w") as f:
        f.write("\n".join(paths) + "\n")

    multi = MultiCameraEngine(model_a, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2,
                              replay_capacity=4)
    multi.enable_cont_learning = True
    assert multi.load_replay_buffer_from_file(listfile) == 3
    assert multi.replay_buffer.shape == (4, 16, 16, 3)  # capacity-padded

    ticks = [[rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
             for _ in range(2)]
    multi.process_frames(ticks[0], now=0.1)
    multi.process_frames(ticks[1], now=1.0)  # fires CL with replay
    assert multi.cl_epochs == 1

    # manual step: ring slots [tick0, tick1] ++ replay (3 live + 1 pad)
    model_b.compile()
    rng_b = model_b._next_rng()
    ring_rows = np.stack(ticks[0] + ticks[1]).astype(np.float32) / 255.0
    replay_rows = np.asarray(multi.replay_buffer)
    stacked = jnp.asarray(np.concatenate([ring_rows, replay_rows]))
    weights = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 0], np.float32))
    core, opt = model_b.core, model_b.optimizer

    def loss_fn(p):
        ld, _ = core.compute_loss(p, stacked, training=True, return_inf=True,
                                  rng=rng_b, weights=weights)
        return ld["loss"], ld

    grads, ld = jax.grad(loss_fn, has_aux=True)(model_b.params)
    updates, _ = opt.update(grads, model_b.opt_state, model_b.params)
    want = optax.apply_updates(model_b.params, updates)

    np.testing.assert_allclose(
        float(ld["loss"]), multi.last_epoch_loss["loss"], rtol=1e-5)
    for g, w in zip(jax.tree_util.tree_leaves(multi.model.params),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-6)


def test_recording_per_stream(setup, tmp_path):
    """Per-stream recording: each camera gets its own 5-PNG-stream subtree
    and labels.json with anomaly-score annotations; dropped ticks record
    nothing for that stream; one shared model snapshot loads back."""
    import json
    import os
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings))
    rec_root = str(tmp_path / "rec")
    os.makedirs(rec_root)
    inst = multi.begin_recording(rec_root, names=["front", "back"])
    multi.record_period_ms = 0.0  # record every tick

    rng = np.random.RandomState(14)
    f = lambda: rng.randint(0, 255, (16, 16, 3), np.uint8)
    multi.process_frames([f(), f()], now=1.0)
    multi.process_frames([f(), None], now=2.0)  # back drops this tick
    out = multi.terminate_recording()
    assert out == inst and not multi.recording_flag

    n_front = len(os.listdir(os.path.join(inst, "front", "frames")))
    n_back = len(os.listdir(os.path.join(inst, "back", "frames")))
    assert n_front == 2 and n_back == 1
    for name, n in (("front", n_front), ("back", n_back)):
        for sub in ("err", "heatmap", "overlay", "rec"):
            assert len(os.listdir(os.path.join(inst, name, sub))) == n
        labels = json.load(open(os.path.join(inst, name, "labels.json")))
        assert len(labels["images"]) == n
        assert len(labels["annotations"]) == n  # warmup scores recorded too
    loaded, _ = load_model_from_directory(os.path.join(inst, "model"))
    assert loaded is not None

    # each per-cam subtree is a valid single-stream recording instance:
    # create_video_from_logs consumes it unchanged
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from create_video_from_logs import load_data_from_directory
    data = load_data_from_directory(os.path.join(inst, "front"))
    assert len(data["frames"]) == n_front


def test_all_cameras_cli_end_to_end(setup, tmp_path):
    """The full fleet surface is reachable from the shipped CLI in ONE run:
    --all-cameras with CL, a replay buffer, recording, and a model cache
    (camera_streamer.py run_all_cameras)."""
    import os
    import subprocess
    import sys
    import yaml
    from PIL import Image
    from trustedai_cl_vae_ad_tpu.train.checkpoint import save_checkpoint

    _, config, _ = setup
    model = _fresh_model(config)
    mdir = str(tmp_path / "model")
    os.makedirs(mdir)
    save_checkpoint(mdir, model.params)
    with open(os.path.join(mdir, "config.yml"), "w") as f:
        yaml.safe_dump(config, f)

    rng = np.random.RandomState(15)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"replay{i}.png")
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(p)
        paths.append(p)
    lst = str(tmp_path / "replay.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths))
    rec = str(tmp_path / "rec")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TCVAE_PLATFORM="cpu")
    stats = str(tmp_path / "stats.jsonl")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "camera_streamer.py"), "-m", mdir,
         "--all-cameras", "--n-streams", "2", "-c", "--replay-buffer", lst,
         "--record-dir", rec, "--model-cache-dir", str(tmp_path / "cache"),
         "--max-frames", "6", "--pipelined", "--stats-jsonl", stats],
        capture_output=True, text=True, timeout=500, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Replay Buffer Loaded: 2" in proc.stdout
    assert "processed 6 ticks x 2 streams" in proc.stdout
    # pipelined mode emits tick N-1's scores at tick N; rows must be labeled
    # with the tick the scores belong to, and the flush row completes the set
    import json
    rows = [json.loads(l) for l in open(stats)]
    assert sorted(r["tick"] for r in rows) == list(range(6)), rows
    assert rows[-1].get("flushed") and rows[-1]["tick"] == 5
    inst = [d for d in os.listdir(rec) if d.startswith("data_")]
    assert len(inst) == 1
    inst_dir = os.path.join(rec, inst[0])
    # terminate_recording ran in the finally block: labels + model snapshot
    assert os.path.isfile(os.path.join(inst_dir, "synthetic0", "labels.json"))
    assert os.path.isdir(os.path.join(inst_dir, "model", "encoder"))
    # the snapshot embeds the replay provenance
    assert os.path.isfile(os.path.join(inst_dir, "model",
                                       "replay_buffer_paths.csv"))


def test_fleet_cl_detection_quality(setup):
    """End-to-end fleet detection with CL on: two static scenes train the
    shared weights; a blob injected into stream 0 bursts ITS pixel count and
    trips ITS state machine while stream 1 stays quiet (per-stream EMA state
    + one shared model, the fleet-CL promise)."""
    from trustedai_cl_vae_ad_tpu.stream.capture import SyntheticSource
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2)
    multi.enable_cont_learning = True
    multi.set_learning_rate(1e-3)

    srcs = [SyntheticSource(width=24, height=20, n_frames=60, seed=0,
                            anomaly_frames=range(50, 54), motion=0.0),
            SyntheticSource(width=24, height=20, n_frames=60, seed=7,
                            motion=0.0)]
    counts = {0: [], 1: []}
    anomalous = {0: False, 1: False}
    for t in range(60):
        out = multi.process_frames([s.read() for s in srcs], now=float(t))
        for i, r in enumerate(out):
            counts[i].append(r.pixel_count)
            anomalous[i] = anomalous[i] or r.anomalous
    assert multi.cl_epochs >= 50  # CL ran throughout (period 500ms, 1s ticks)
    steady0 = np.mean(counts[0][40:50])
    burst0 = np.max(counts[0][50:54])
    assert burst0 > steady0 and burst0 >= 1.0, (steady0, burst0)
    assert anomalous[0]
    # the quiet stream's post-warmup tail never bursts like the blob stream
    assert np.max(counts[1][40:]) < burst0


def test_recording_duplicate_names(setup, tmp_path):
    """User cam_config names may collide: begin_recording uniquifies the
    subtrees instead of crashing or interleaving two streams."""
    import os
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    multi = MultiCameraEngine(model, config, n_streams=3,
                              anomaly_settings=dict(settings))
    rec = str(tmp_path / "rec")
    os.makedirs(rec)
    inst = multi.begin_recording(rec, names=["gate", "gate", "gate"])
    assert multi._stream_names == ["gate", "gate_1", "gate_2"]
    for n in multi._stream_names:
        assert os.path.isdir(os.path.join(inst, n, "frames"))


def test_pipelined_mode_lags_one_tick(setup):
    """pipelined=True returns tick N-1's results when tick N is submitted;
    the per-stream sequences match the unpipelined engine shifted by one
    (single-stream pipelined parity, lifted to K streams)."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    rng = np.random.RandomState(21)
    ticks = [[rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
             for _ in range(5)]

    def run(pipelined):
        eng = MultiCameraEngine(model, config, n_streams=2,
                                anomaly_settings=dict(settings),
                                pipelined=pipelined)
        outs = [eng.process_frames(t, now=float(i))
                for i, t in enumerate(ticks)]
        if pipelined:
            outs.append(eng.flush(now=5.0))
        return [[None if r is None else (r.pixel_count, int(r.norm_err_u8.sum()))
                 for r in out] for out in outs]

    seq_a = run(False)
    seq_b = run(True)
    assert seq_b[0] == [None, None]  # warmup tick
    assert seq_b[1:] == seq_a  # shifted by one; flush returns the last


def test_mesh_sharded_equivalence(setup):
    """mesh=make_mesh() shards K streams over the data axis: scoring AND a
    fleet-CL step must match the unsharded engine exactly (the horizontal
    scale-out path for >128-camera fleets)."""
    import jax
    from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    mesh = make_mesh()
    k = 2 * int(mesh.devices.size)

    rng = np.random.RandomState(23)
    ticks = [[rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(k)]
             for _ in range(3)]
    ticks[1][3] = None  # a dropped stream must mask identically when sharded

    def run(mesh_arg):
        eng = MultiCameraEngine(_fresh_model(config), config, n_streams=k,
                                anomaly_settings=dict(settings),
                                cl_ring_ticks=2, mesh=mesh_arg)
        eng.enable_cont_learning = True
        outs = [eng.process_frames(t, now=0.1 * (i + 1) if i < 2 else 1.0)
                for i, t in enumerate(ticks)]  # third tick fires CL
        assert eng.cl_epochs == 1
        scores = [[None if r is None else r.score for r in out] for out in outs]
        return scores, eng.last_epoch_loss["loss"], eng.model.params

    scores_a, loss_a, params_a = run(None)
    scores_b, loss_b, params_b = run(mesh)
    np.testing.assert_allclose(
        np.asarray(scores_a, np.float64), np.asarray(scores_b, np.float64),
        rtol=1e-5, equal_nan=True)
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_cdf_warmup_skip_and_new_task_keeps_ema(setup):
    """cdf_warmup_skip drops the first K post-start/new_task scores from
    each stream's CDF history (engine._record_score parity, per stream);
    new_task keeps the scorer EMA by default and hard-resets only with
    reset_scorer=True."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    settings = dict(settings, anomaly_score_method="cdf", cdf_warmup_skip=3)
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=settings)
    rng = np.random.RandomState(31)
    scores = []
    for t in range(40):
        out = multi.process_frames(
            [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)],
            now=float(t))
        scores.append(out[0].score)
    # skip=3: only finite scores from tick 4 on enter the history
    want = sum(1 for t, s in enumerate(scores) if t >= 3 and np.isfinite(s))
    assert want > 0, "fixture produced no finite scores"
    assert len(multi._score_history[0]) == want
    assert multi._task_scored[0] == 40

    maps_before = np.asarray(multi.maps[0]).copy()
    multi.new_task(0)  # default: EMA kept
    assert len(multi._score_history[0]) == 0 and multi._task_scored[0] == 0
    np.testing.assert_array_equal(np.asarray(multi.maps[0]), maps_before)
    multi.new_task(0, reset_scorer=True)  # hard reset opt-in
    assert np.abs(np.asarray(multi.maps[0])).max() == 0


def test_no_anomaly_settings_scores_without_state_machine(setup):
    """An engine built WITHOUT anomaly_settings still scores (monitoring
    mode): current_threshold returns None instead of crashing, nothing is
    flagged anomalous. Regression: current_threshold used to raise
    AttributeError on both engines (caught by the soak harness)."""
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, _ = setup
    multi = MultiCameraEngine(model, config, n_streams=2)
    rng = np.random.RandomState(3)
    for t in range(3):
        out = multi.process_frames(
            [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(2)],
            now=float(t))
    assert multi.current_threshold(0) is None
    assert all(not r.anomalous for r in out)

    single = StreamingEngine(model, config)
    single.inference_period_ms = 0.0
    for t in range(3):
        r = single.process_frame(rng.randint(0, 255, (16, 16, 3), np.uint8))
    assert single.current_threshold() is None
    assert not r.anomalous


def test_recording_adversarial_duplicate_names(setup, tmp_path):
    """The uniquifier must re-check renamed candidates: ['gate','gate_1','gate']
    used to produce a second 'gate_1' and crash os.makedirs."""
    import os
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    multi = MultiCameraEngine(model, config, n_streams=3,
                              anomaly_settings=dict(settings))
    rec = str(tmp_path / "rec2")
    os.makedirs(rec)
    inst = multi.begin_recording(rec, names=["gate", "gate_1", "gate"])
    assert multi._stream_names == ["gate", "gate_1", "gate_2"]
    for n in multi._stream_names:
        assert os.path.isdir(os.path.join(inst, n, "frames"))


def test_warmup_pin_survives_all_dropped_tick(setup):
    """An all-dropped first tick (cameras still connecting) must NOT confirm
    the provisional warmup shape pin: the first tick that actually delivers a
    frame re-pins to the delivered resolution (in-jit device resize semantics)
    instead of host-resizing every later frame to the stale warmup shape."""
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    model, config, settings = setup
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings))
    multi.warmup(frame_shape=(32, 32, 3))
    assert multi._warm_pin and multi._ref_shape == (32, 32, 3)

    multi.process_frames([None, None], now=0.0)  # cameras still connecting
    assert multi._warm_pin, "all-dropped tick must keep the pin provisional"

    frame = np.full((16, 16, 3), 128, np.uint8)
    multi.process_frames([frame, None], now=1.0)
    assert not multi._warm_pin
    assert multi._ref_shape == (16, 16, 3)  # re-pinned to the delivered shape


def test_cl_async_autosave_roundtrip(setup, tmp_path):
    """async_autosave on the fleet engine: the autosave tick backgrounds the
    write, fleet CL keeps stepping (donating the saved buffers), and after
    drain_autosaves() the cache dir loads through the standard registry."""
    import jax
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    _, config, settings = setup
    model = _fresh_model(config)
    cache = str(tmp_path / "cache")
    multi = MultiCameraEngine(model, config, n_streams=2,
                              anomaly_settings=dict(settings), cl_ring_ticks=2,
                              model_cache_dir=cache, autosave_period_s=1.0,
                              async_autosave=True)
    multi.enable_cont_learning = True

    rng = np.random.RandomState(12)
    f = lambda: rng.randint(0, 255, (16, 16, 3), np.uint8)
    multi.process_frames([f(), f()], now=0.1)  # arms the autosave timer
    multi.process_frames([f(), f()], now=1.0)  # fires CL (dirty)
    multi.process_frames([f(), f()], now=1.5)  # period elapsed -> async save
    assert multi._async_saver is not None  # async path was taken
    assert not multi.model_changed_flag
    multi.process_frames([f(), f()], now=2.0)  # CL trains on donated buffers
    multi.drain_autosaves()

    loaded, _ = load_model_from_directory(cache)
    for g in jax.tree_util.tree_leaves(loaded.params):
        assert np.isfinite(np.asarray(g, np.float32)).all()
    # structure matches the live tree (values differ: CL stepped after save)
    jax.tree_util.tree_map(lambda a, b: None, loaded.params, multi.model.params)
