#!/usr/bin/env python3
"""HTTP anomaly-scoring server with continuous micro-batching.

Production-serving surface over a trained model (the streaming engine covers
live video; this covers request/response scoring). TPU-idiomatic design:

  * requests are queued and coalesced into micro-batches (max size /
    max wait), so concurrent clients share one device dispatch;
  * batches are padded UP to a fixed set of bucket sizes — each bucket is
    one jit shape, compiled once (on remote-compile runtimes a fresh shape
    costs 90-200 s, so unbounded dynamic batching would stall the server);
  * the scoring function is the offline pipeline's math
    (do_anomaly_detection.py:62-92): per-frame channel-summed squared
    reconstruction error, z-scored against reference stats when provided.

Endpoints:
  GET  /healthz                    -> {"ok": true, ...}
  POST /score                      -> {"reconstruction_error": eps, "z": z?,
                                       "anomalous": ?}  ("error" appears
                                       ONLY in failure payloads)
       body: PNG bytes (or any PIL-decodable image)
  POST /reconstruct                -> PNG bytes of the reconstruction

Usage:
  python serve.py -m <logdir> [--port 8000] [--stats stats.json]
                  [--threshold 3.0] [--max-batch 8] [--max-wait-ms 5]

--stats points at a JSON {"meu": ..., "sigma": ...} as produced by the
offline pass-1 (anomaly/offline.get_data_scale); without it /score returns
raw errors only.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MicroBatcher:
    """Coalesces scoring requests into bucket-padded device batches."""

    BUCKETS = (1, 2, 4, 8, 16)

    def __init__(self, model, config, max_batch: int = 8,
                 max_wait_ms: float = 5.0, quantize: bool = False,
                 qparams=None):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.max_batch = self._clamp_to_bucket(max_batch)
        self.max_wait_s = max_wait_ms / 1000.0
        size = config["data"]["image_size"]
        self.hwc = (int(size[0]), int(size[1]), int(size[2]))
        self.queue: queue.Queue = queue.Queue()
        self._stop = False
        # serializes submit() against close(): a submit racing shutdown must
        # fail fast, not enqueue into a queue nothing will ever drain again
        # (the client would block for its full result() timeout)
        self._submit_lock = threading.Lock()
        # observability (read by the /metrics endpoint): how full the
        # coalesced batches run tells the operator whether max_batch /
        # max_wait_ms match the offered load. _stats_lock guards them — the
        # worker thread inserts new bucket_counts keys while /metrics
        # handler threads iterate the dict.
        self._stats_lock = threading.Lock()
        self.batches_dispatched = 0
        self.items_scored = 0
        self.batch_errors = 0
        self.bucket_counts: dict = {}

        core = model.core
        self.quantized = bool(quantize) or qparams is not None
        # int8 big-dense kernels when quantized: serving batches are
        # weight-streaming bound, so halving the dominant kernel bytes cuts
        # the tick time (ops/quant.py; fidelity in tests/test_quant.py).
        # ``qparams`` = pre-quantized checkpoint tree (int8 serving boot:
        # half the upload, no on-device quantization pass).
        from trustedai_cl_vae_ad_tpu.ops.quant import serving_forward

        _forward, self._serve_params = serving_forward(
            core, getattr(model, "params", None), quantize=self.quantized,
            qparams=qparams,
        )

        def _eps_and_rec(params, x_u8):
            # every batch is assembled as np.zeros((bucket, *self.hwc)) from
            # _decode_to_model_size output, so x is model-sized by contract
            x = x_u8.astype(jnp.float32) / 255.0
            x_hat = _forward(params, x)
            err = jnp.sum((x - x_hat) ** 2, axis=3)
            eps = jnp.sum(err, axis=(1, 2))  # per-frame scalar (ref :62)
            return eps, x_hat

        def score_batch(params, x_u8):
            # /score-only dispatch: no reconstruction leaves the device (the
            # rec fetch is bucket x H x W x 3 bytes/tick of discarded data)
            eps, _ = _eps_and_rec(params, x_u8)
            return eps

        def score_rec_batch(params, x_u8):
            eps, x_hat = _eps_and_rec(params, x_u8)
            rec_u8 = jnp.clip(jnp.round(255.0 * x_hat), 0, 255).astype(jnp.uint8)
            return eps, rec_u8

        self._score_j = jax.jit(score_batch)
        self._score_rec_j = jax.jit(score_rec_batch)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    @classmethod
    def _clamp_to_bucket(cls, max_batch: int) -> int:
        """Round max_batch UP to a bucket value: _run pads any coalesced group
        of n <= max_batch to the covering bucket, so max_batch itself must BE
        a warmed bucket or the first busy burst hits a fresh jit shape on the
        request path (90-200 s on remote-compile runtimes)."""
        max_batch = min(max(1, max_batch), cls.BUCKETS[-1])
        return next(b for b in cls.BUCKETS if b >= max_batch)

    def warmup(self, buckets=None) -> None:
        """Pre-compile the bucket shapes (one-time cost, off the request path).

        Both the score-only and score+reconstruction variants are warmed so
        no request mix hits a fresh jit shape (TCVAE_COMPILE_CACHE makes
        restarts cheap on remote-compile runtimes)."""
        import numpy as np

        for b in buckets or [x for x in self.BUCKETS if x <= self.max_batch]:
            batch = np.zeros((b, *self.hwc), np.uint8)
            eps = self._score_j(self._serve_params, batch)
            eps2, _ = self._score_rec_j(self._serve_params, batch)
            float(eps[0]) + float(eps2[0])

    def submit(self, img_u8, want_rec: bool = False) -> Future:
        fut: Future = Future()
        with self._submit_lock:
            if self._stop:
                # the worker is (being) shut down; nothing will drain the
                # queue again — fail fast instead of hanging the client for
                # its full result() timeout
                fut.set_exception(RuntimeError("server shutting down"))
                return fut
            self.queue.put((img_u8, want_rec, fut))
        return fut

    def close(self):
        with self._submit_lock:
            self._stop = True
        self.thread.join(timeout=2)
        # fail anything still queued (or left in flight past the join
        # timeout) so clients error immediately instead of blocking until
        # their own result() timeout. submit() can no longer enqueue: it
        # fails fast under _submit_lock once _stop is set, so this drain is
        # the last touch the queue ever gets.
        while True:
            try:
                _img, _want_rec, fut = self.queue.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("server shutting down"))

    def _run(self):
        import numpy as np

        while not self._stop:
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(items) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            n = len(items)
            bucket = next(b for b in self.BUCKETS if b >= n)
            with self._stats_lock:
                self.batches_dispatched += 1
                self.items_scored += n
                self.bucket_counts[bucket] = self.bucket_counts.get(bucket, 0) + 1
            # EVERYTHING per-batch lives inside the try: a bad image shape in
            # batch assembly must fail these futures, not kill the batcher
            # thread (which would leave every later request hanging for its
            # full client timeout)
            try:
                batch = np.zeros((bucket, *self.hwc), np.uint8)
                for i, (img, _wr, _f) in enumerate(items):
                    batch[i] = img
                if any(wr for _img, wr, _f in items):
                    eps, rec = self._score_rec_j(self._serve_params, batch)
                    rec = np.asarray(rec)
                else:
                    eps, rec = self._score_j(self._serve_params, batch), None
                eps = np.asarray(eps)
                for i, (_img, wr, fut) in enumerate(items):
                    fut.set_result((float(eps[i]), rec[i] if rec is not None else None))
            except Exception as e:
                with self._stats_lock:
                    self.batch_errors += 1
                for _img, _wr, fut in items:
                    if not fut.done():
                        fut.set_exception(e)


def _decode_to_model_size(body: bytes, hwc):
    import numpy as np
    from PIL import Image

    h, w, c = hwc
    # honor the model's channel count: a 1-channel model (image_size [..,..,1])
    # must receive (H, W, 1), not an RGB conversion that can't fit its batch
    img = Image.open(io.BytesIO(body)).convert("L" if c == 1 else "RGB")
    if img.size != (w, h):
        img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, np.uint8)
    if c == 1:
        arr = arr[..., None]
    return arr


class ServerMetrics:
    """Thread-safe request counters + a bounded latency reservoir for the
    /metrics endpoint (new TPU-native serving capability; the reference has
    no server). Latencies keep the most recent window only — a long-lived
    server must not grow host state per request (benchmarks/soak.py)."""

    def __init__(self, window: int = 2048):
        from collections import deque

        self._lock = threading.Lock()
        self.started = time.time()
        self.requests = {}      # path -> count
        self.failures = {}      # path -> count
        self._lat_ms = deque(maxlen=window)

    def record(self, path: str, ms: float, ok: bool) -> None:
        with self._lock:
            self.requests[path] = self.requests.get(path, 0) + 1
            if not ok:
                self.failures[path] = self.failures.get(path, 0) + 1
            self._lat_ms.append(ms)

    def snapshot(self, batcher: "MicroBatcher") -> dict:
        import numpy as np

        with self._lock:
            lat = list(self._lat_ms)
            out = {
                "uptime_s": round(time.time() - self.started, 1),
                "requests": dict(self.requests),
                "failures": dict(self.failures),
            }
        if lat:
            out["latency_ms"] = {
                "window": len(lat),
                "p50": round(float(np.percentile(lat, 50)), 2),
                "p95": round(float(np.percentile(lat, 95)), 2),
                "p99": round(float(np.percentile(lat, 99)), 2),
            }
        # read the batcher counters under its lock: the worker thread inserts
        # new bucket_counts keys mid-iteration otherwise (RuntimeError), and
        # items/batches must pair from the same instant for mean_batch_fill
        with batcher._stats_lock:
            dispatched = batcher.batches_dispatched
            scored = batcher.items_scored
            errors = batcher.batch_errors
            buckets = dict(batcher.bucket_counts)
        out["batcher"] = {
            "batches_dispatched": dispatched,
            "items_scored": scored,
            "batch_errors": errors,
            "bucket_counts": buckets,
            "mean_batch_fill": round(scored / dispatched, 3)
            if dispatched else None,
            "queue_depth": batcher.queue.qsize(),
            "quantized": batcher.quantized,
        }
        return out


def _validate_stats(stats: dict) -> None:
    """Reject malformed --stats payloads at boot, not per-request: a missing
    'meu' key used to raise KeyError inside the handler thread (client got a
    dropped connection, metrics recorded a success), and sigma == 0 silently
    disabled z-scoring via the falsy guard."""
    for key in ("meu", "sigma"):
        if not isinstance(stats.get(key), (int, float)):
            raise ValueError(
                f"stats JSON must contain numeric '{key}' "
                f"(got {stats.get(key)!r}); expected the offline pass-1 "
                "format {'meu': ..., 'sigma': ...}")
    if stats["sigma"] == 0:
        raise ValueError("stats sigma must be nonzero (z = (eps - meu) / sigma)")


def make_handler(batcher: MicroBatcher, stats, threshold: float,
                 metrics: ServerMetrics | None = None):
    metrics = metrics or ServerMetrics()
    if stats is not None:
        _validate_stats(stats)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "model_input": list(batcher.hwc),
                                 "max_batch": batcher.max_batch})
            elif self.path == "/metrics":
                self._json(200, metrics.snapshot(batcher))
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/score", "/reconstruct"):
                self._json(404, {"error": "unknown path"})
                return
            t0 = time.perf_counter()

            def done(ok: bool) -> None:
                metrics.record(self.path, 1000 * (time.perf_counter() - t0), ok)

            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                img = _decode_to_model_size(body, batcher.hwc)
            except Exception as e:
                done(False)
                self._json(400, {"error": f"undecodable image: {e}"})
                return
            try:
                want_rec = self.path == "/reconstruct"
                eps, rec = batcher.submit(img, want_rec=want_rec).result(timeout=120)
            except Exception as e:
                done(False)
                self._json(500, {"error": str(e)})
                return
            done(True)
            if self.path == "/reconstruct":
                from PIL import Image

                buf = io.BytesIO()
                if rec.shape[-1] == 1:
                    Image.fromarray(rec[..., 0], mode="L").save(buf, format="PNG")
                else:
                    Image.fromarray(rec, mode="RGB").save(buf, format="PNG")
                png = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
                return
            # "reconstruction_error" is the score. No "error" alias: that key
            # is reserved for the 400/500 failure payloads, so clients can
            # detect failures by its presence as well as by HTTP status.
            out = {"reconstruction_error": eps}
            if stats is not None:  # validated at make_handler time
                z = (eps - stats["meu"]) / stats["sigma"]
                out["z"] = z
                out["anomalous"] = bool(z > threshold)
            self._json(200, out)

    return Handler


def build_server(model_dir: str, port: int = 8000, stats_path: str | None = None,
                 threshold: float = 3.0, max_batch: int = 8,
                 max_wait_ms: float = 5.0, warmup: bool = True,
                 quantize: bool = False):
    from trustedai_cl_vae_ad_tpu.ops.quant import (
        has_quantized_checkpoint,
        load_int8_serving_model,
    )
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    qparams = None
    if quantize and has_quantized_checkpoint(model_dir):
        # int8 serving boot (tools/quantize_checkpoint.py wrote
        # <model_dir>/quantized): load the ~half-size int8 tree directly and
        # NEVER materialize the float params — the flagship's 1.6 GB bf16
        # upload dominated cold boot (BENCH_NOTES r4). Shared helper warns
        # when the float checkpoint is newer (stale int8 tree).
        model, config = load_int8_serving_model(model_dir)
        qparams = model.qparams
    else:
        # load_model_from_directory already restores the params (registry.py);
        # a second load_model call would re-read the multi-GB checkpoint
        model, config = load_model_from_directory(model_dir)
    stats = None
    if stats_path:
        with open(stats_path) as f:
            stats = json.load(f)
    batcher = MicroBatcher(model, config, max_batch=max_batch,
                           max_wait_ms=max_wait_ms, quantize=quantize,
                           qparams=qparams)
    if warmup:
        batcher.warmup()
    server = ThreadingHTTPServer(("0.0.0.0", port),
                                 make_handler(batcher, stats, threshold))
    server.batcher = batcher
    return server


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", "-m", required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--stats", type=str, default=None,
                        help='JSON {"meu":..., "sigma":...} from the offline pass 1')
    parser.add_argument("--threshold", "-t", type=float, default=3.0)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--quantize", action="store_true",
                        help="int8-quantize the big dense kernels for serving "
                             "(halves their HBM streaming; see ops/quant.py)")
    args = parser.parse_args()
    server = build_server(args.model_dir, args.port, args.stats, args.threshold,
                          args.max_batch, args.max_wait_ms, quantize=args.quantize)
    print(f"serving on :{args.port} (buckets pre-compiled, max_batch={args.max_batch})")

    # SIGTERM (the normal supervisor/container stop signal) gets the same
    # clean shutdown as Ctrl-C: stop accepting, fail queued futures so
    # clients error immediately instead of hanging to their own timeouts
    import signal

    def _term(_sig, _frm):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
        server.batcher.close()


if __name__ == "__main__":
    main()
