"""HTTP scoring server: micro-batching, endpoints, bucket padding."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

_LIVE = {}  # the live MicroBatcher, exposed for direct-submit tests


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    import serve

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 4, "layers": [4]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }
    d = tmp_path_factory.mktemp("serve_model")
    model = load_model_from_config(config)
    model.save_model(str(d), include_optimizer=False)
    save_config(config, str(d / "config.yml"))
    stats = d / "stats.json"
    stats.write_text(json.dumps({"meu": 100.0, "sigma": 10.0}))

    srv = serve.build_server(str(d), port=0, stats_path=str(stats),
                             threshold=3.0, max_batch=4, max_wait_ms=10.0)
    _LIVE["batcher"] = srv.batcher
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    srv.batcher.close()


def _png_bytes(seed=0, size=(16, 16)):
    img = np.random.RandomState(seed).randint(0, 255, (*size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] and body["model_input"] == [16, 16, 3]


def test_score_with_stats(server):
    req = urllib.request.Request(f"{server}/score", data=_png_bytes(1), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        body = json.loads(r.read())
    assert np.isfinite(body["reconstruction_error"])
    assert "error" not in body  # reserved for failure payloads
    assert "z" in body and "anomalous" in body
    assert abs(body["z"] - (body["reconstruction_error"] - 100.0) / 10.0) < 1e-4


def test_score_resizes_foreign_sizes(server):
    req = urllib.request.Request(f"{server}/score", data=_png_bytes(2, (40, 30)),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert np.isfinite(json.loads(r.read())["reconstruction_error"])


def test_reconstruct_returns_png(server):
    req = urllib.request.Request(f"{server}/reconstruct", data=_png_bytes(3),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        img = Image.open(io.BytesIO(r.read()))
    assert img.size == (16, 16) and img.mode == "RGB"


def test_concurrent_requests_batch(server):
    """Concurrent clients must all get correct answers (the batcher coalesces
    them into padded buckets); same image => same score regardless of batch."""
    results = {}

    def call(i):
        req = urllib.request.Request(f"{server}/score", data=_png_bytes(7),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            results[i] = json.loads(r.read())["reconstruction_error"]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    vals = list(results.values())
    assert len(vals) == 6
    np.testing.assert_allclose(vals, vals[0], rtol=1e-4)


def test_bad_image_400(server):
    req = urllib.request.Request(f"{server}/score", data=b"not a png", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_max_batch_clamps_to_bucket():
    """A non-bucket --max-batch must round UP to a warmed bucket, or the
    first busy burst would jit a fresh shape on the request path."""
    import serve

    for requested, expected in ((12, 16), (3, 4), (5, 8), (8, 8), (99, 16), (1, 1)):
        got = serve.MicroBatcher._clamp_to_bucket(requested)
        assert got == expected, (requested, got)


def test_bad_submit_fails_future_not_thread(server):
    """A malformed direct submit fails ITS future; the batcher thread
    survives and later requests still succeed (batch assembly runs inside
    the per-batch try)."""
    batcher = _LIVE["batcher"]
    fut = batcher.submit(np.zeros((99, 99, 99), np.uint8))
    with pytest.raises(Exception):
        fut.result(timeout=30)
    # thread still alive: a well-formed score-only request completes, with
    # no reconstruction fetched off-device
    good = batcher.submit(np.zeros(batcher.hwc, np.uint8))
    eps, rec = good.result(timeout=30)
    assert np.isfinite(eps) and rec is None


def test_close_fails_queued_futures():
    """close() must resolve still-queued futures instead of abandoning them."""
    import queue as _q
    from concurrent.futures import Future

    import serve

    batcher = serve.MicroBatcher.__new__(serve.MicroBatcher)
    batcher.queue = _q.Queue()
    batcher._stop = False
    batcher._submit_lock = threading.Lock()

    class _DoneThread:
        def join(self, timeout=None):
            pass

    batcher.thread = _DoneThread()
    fut = Future()
    batcher.queue.put((None, False, fut))
    batcher.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=1)


def test_int8_checkpoint_boot(tmp_path, monkeypatch):
    """serve.build_server(quantize=True) boots from <logdir>/quantized when
    present — no float-param materialization — and scores identically to the
    quantize-at-boot path."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.ops import quant
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    import serve

    config = {
        "data": {"image_size": [16, 16, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "decoder_dense_filters": 4,
                  "latent_dimensions": 4, "layers": [4]},
        "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                     "max_epochs": 1},
    }
    d = tmp_path / "m"
    d.mkdir()
    model = load_model_from_config(config)
    model.save_model(str(d), include_optimizer=False)
    save_config(config, str(d / "config.yml"))

    # quantize everything (tiny model) so the boot path has work to skip
    monkeypatch.setenv("TCVAE_QUANT_MIN_ELEMS", "0")
    # reference FIRST (no quantized/ dir yet): quantize-at-boot
    # (float load + on-device quantization)
    srv_ref = serve.build_server(str(d), port=0, quantize=True, warmup=False)
    assert srv_ref.batcher.model.params is not None

    # write the int8 checkpoint through the real CLI tool
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TCVAE_PLATFORM="cpu", TCVAE_QUANT_MIN_ELEMS="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "quantize_checkpoint.py"),
         "-m", str(d)],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert quant.has_quantized_checkpoint(str(d))

    # int8 boot: finds the checkpoint, float tree never built
    srv_q = serve.build_server(str(d), port=0, quantize=True, warmup=False)
    assert srv_q.batcher.model.params is None
    x = np.random.RandomState(0).randint(0, 255, (1, 16, 16, 3), np.uint8)
    import jax.numpy as jnp

    eps_ref = np.asarray(srv_ref.batcher._score_j(
        srv_ref.batcher._serve_params, jnp.asarray(x)))
    eps_q = np.asarray(srv_q.batcher._score_j(
        srv_q.batcher._serve_params, jnp.asarray(x)))
    np.testing.assert_allclose(eps_q, eps_ref, rtol=1e-5, atol=1e-6)
    srv_ref.batcher.close()
    srv_q.batcher.close()
    srv_ref.server_close()
    srv_q.server_close()


def test_metrics_endpoint(server):
    """/metrics exposes request counts, a bounded latency window, and
    batcher occupancy (batches dispatched, mean fill, bucket histogram) —
    the operator's view of whether max_batch/max_wait match the load."""
    req = urllib.request.Request(f"{server}/score", data=_png_bytes(31),
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
    with urllib.request.urlopen(f"{server}/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"]["/score"] >= 1
    assert m["uptime_s"] >= 0
    assert m["latency_ms"]["window"] >= 1 and m["latency_ms"]["p50"] > 0
    b = m["batcher"]
    assert b["items_scored"] >= 1 and b["batches_dispatched"] >= 1
    assert 1.0 <= b["mean_batch_fill"] <= 4.0  # max_batch=4 in the fixture
    assert sum(b["bucket_counts"].values()) == b["batches_dispatched"]
    # failures are counted per path (undecodable image -> 400)
    bad = urllib.request.Request(f"{server}/score", data=b"not a png")
    try:
        urllib.request.urlopen(bad, timeout=30)
    except urllib.error.HTTPError as e:
        assert e.code == 400
    with urllib.request.urlopen(f"{server}/metrics", timeout=30) as r:
        m2 = json.loads(r.read())
    assert m2["failures"].get("/score", 0) >= 1


def test_submit_after_close_fails_fast():
    """A submit() racing close() must fail immediately — the worker is dead
    and nothing would ever drain the queue again (the client used to hang
    for its full result() timeout)."""
    import queue as _q

    import serve

    batcher = serve.MicroBatcher.__new__(serve.MicroBatcher)
    batcher.queue = _q.Queue()
    batcher._stop = False
    batcher._submit_lock = threading.Lock()

    class _DoneThread:
        def join(self, timeout=None):
            pass

    batcher.thread = _DoneThread()
    batcher.close()
    fut = batcher.submit(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=1)
    assert batcher.queue.empty()  # nothing leaked into the dead queue


def test_stats_validation():
    """Malformed --stats payloads are rejected at boot (make_handler), not
    per-request: a missing 'meu' used to KeyError inside the handler thread
    and sigma==0 silently disabled z-scoring."""
    import serve

    serve._validate_stats({"meu": 100.0, "sigma": 10.0})  # canonical payload
    serve._validate_stats({"meu": 0, "sigma": -1.5})      # numeric, nonzero
    for bad in ({"sigma": 2.0},                 # meu missing
                {"meu": 1.0},                   # sigma missing
                {"meu": 1.0, "sigma": 0},       # zero sigma
                {"meu": "1.0", "sigma": 2.0}):  # non-numeric
        with pytest.raises(ValueError):
            serve._validate_stats(bad)
