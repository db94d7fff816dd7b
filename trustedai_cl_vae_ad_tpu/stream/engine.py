"""Headless streaming inference + continual-learning engine.

The TPU-native core of the reference's live camera app
(camera_streamer_qt.py:116-1502) with the Qt shell factored out (the Qt/tk
GUIs are thin views over this engine). Capability map:

  * frame ring buffer of 16 device-resident frames — the reference's
    DataQueue of tf.Variables (:61-81, :182) becomes a jnp ring updated by
    dynamic_update_slice INSIDE the jitted step (no per-tick host traffic);
  * per-frame inference + streaming anomaly score as ONE jitted program:
    device resize/normalize -> CVAE forward -> fused EMA scorer
    (ops/stream_score.py) — the reference's per-tick host resize (:1296) and
    15-op TF scoring block (:1366-1400) collapse into a single dispatch,
    which is what makes <10 ms p50 per frame possible;
  * continual learning: gradient step on ring [+ replay buffer] at a dialed
    cadence with runtime-mutable lr (:1325-1329) — an optax injected
    hyperparameter, so re-dialing never recompiles; the img-noise/beta dial
    (:1331-1336) is stored but — as in the reference — has no effect on the
    training loss (the input-fuzz path is dead, abstract_cvae.py:139-143);
  * replay buffer load from txt/csv of image paths (:702-795);
  * anomaly state machine with threshold + hold period from cam_config
    ``anomaly_settings`` (:280-285, :898-914);
  * recording pipeline: frames/err/heatmap/overlay/rec PNG streams + COCO
    labels.json with per-frame anomaly-score annotations (:1017-1102,
    :1210-1260);
  * model autosave: schedule flag + dirty flag, save to cache dir with
    cam_info embedded in config.yml and replay_buffer_paths.csv (:917-1010);
  * dataset combine (:798-850);
  * per-phase timing EMA (process_rate, :1111-1139) logged not printed.
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import shutil
import time
from copy import deepcopy
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trustedai_cl_vae_ad_tpu.config import load_config, save_config
from trustedai_cl_vae_ad_tpu.ops import stream_score
from trustedai_cl_vae_ad_tpu.ops.stream_score import StreamScoreState


def validate_anomaly_settings(anomaly_settings: dict) -> dict:
    """cam_config['anomaly_settings'] schema (camera_streamer_qt.py:280-285)."""
    assert anomaly_settings is not None
    for key in (
        "anomaly_score_threshold",
        "anomaly_score_method",
        "buffer_record_period_s",
        "anomalous_state_period_s",
    ):
        assert key in anomaly_settings, f"anomaly_settings missing {key}"
    return anomaly_settings


def load_cam_config(path: str, index: int = 0) -> dict:
    """cam_config.yml: camera_list + anomaly_settings (:264-304)."""
    cam_config = load_config(path)
    assert "camera_list" in cam_config
    assert len(cam_config["camera_list"]) > 0
    assert index < len(cam_config["camera_list"])
    if "anomaly_settings" in cam_config:
        validate_anomaly_settings(cam_config["anomaly_settings"])
    return cam_config


@dataclass
class FrameResult:
    score: float
    score_ma: float
    pixel_count: float
    anomalous: bool
    _norm_dev: object = None       # device arrays; fetched lazily
    _rec_dev: object = None
    cl_stepped: bool = False
    loss: Optional[dict] = None
    tag: object = None             # caller's id for the SCORED frame: in
    # pipelined mode results lag one SUBMITTED frame, and hold-off skips
    # mean submissions aren't every call — the tag travels with the frame
    # so stats rows attribute scores to the right frame
    _norm_np: object = None        # memoized host copies (one fetch each)
    _rec_np: object = None

    @property
    def norm_err_u8(self) -> np.ndarray:
        """(H, W) uint8 normalized error map (device->host on first access)."""
        if self._norm_np is None:
            self._norm_np = np.asarray(self._norm_dev)
        return self._norm_np

    @property
    def reconstruction_u8(self) -> np.ndarray:
        """(H, W, C) uint8 reconstruction (device->host on first access)."""
        if self._rec_np is None:
            self._rec_np = np.asarray(self._rec_dev)
        return self._rec_np


class StreamingEngine:
    RING_SIZE = 16

    def __init__(
        self,
        model,
        config: dict,
        anomaly_settings: Optional[dict] = None,
        cam_info: Optional[dict] = None,
        stream_error_ma: float = 0.99,
        anomaly_ma_weight: float = 0.9,
        inference_period_ms: float = 50.0,
        continuous_learning_period_ms: float = 500.0,
        model_cache_dir: Optional[str] = None,
        autosave_period_s: float = 5 * 60.0,
        host_resize: bool = False,
        pipelined: bool = False,
        metrics=None,
        replay_capacity: int = 256,
        quantize: bool = False,
        qparams=None,
        async_autosave: bool = False,
    ):
        self.model = model
        # async_autosave: the periodic cache save otherwise blocks the frame
        # loop for the full disk write of params + Adam moments (~8 GB at
        # flagship scale — tens of seconds of dropped frames every period).
        # With an AsyncSaver the tick resumes after the device->host copy
        # (donation-safe; train/checkpoint.py) and the write backgrounds.
        # Only the AUTOSAVE path is async: explicit saves and the recording
        # snapshot (terminate_recording) keep their on-return durability.
        # Call drain_autosaves() before process exit (the CLIs do).
        self.async_autosave = bool(async_autosave)
        self._async_saver = None
        # int8 big-dense kernels for the inference dispatch (ops/quant.py):
        # the per-frame forward is weight-streaming bound, so halving the
        # dominant kernel bytes cuts frame latency. CL keeps float params;
        # after each CL step the serving copy is re-quantized (a bandwidth
        # pass over the params, ~ms — cheap at the 500 ms CL cadence).
        # ``qparams`` = a pre-quantized tree (load_quantized_checkpoint):
        # serve from it directly — model.params may then be None (the
        # int8-checkpoint boot skips the float upload entirely; CL raises).
        self.quantized = bool(quantize) or qparams is not None
        self._qparams = qparams
        self.config = config
        # validate here, not just in load_cam_config: the CDF-threshold path
        # still needs the fixed threshold during warm-up, so a settings dict
        # missing a key must fail at construction, not on the first frame
        self.anomaly_settings = (
            validate_anomaly_settings(anomaly_settings)
            if anomaly_settings is not None
            else None
        )
        self.cam_info = cam_info or {}
        self.stream_error_ma = float(stream_error_ma)
        self.anomaly_ma_weight = float(anomaly_ma_weight)
        self.inference_period_ms = inference_period_ms
        self.continuous_learning_period_ms = continuous_learning_period_ms
        self.model_cache_dir = model_cache_dir
        self.autosave_period_s = autosave_period_s
        # Pre-shrink frames on host (cv2 INTER_AREA) before upload: trades the
        # on-device antialias resize for a ~30x smaller host->device transfer
        # (6 MB 1080p -> 200 KB). Worth it when the TPU link is thin.
        self.host_resize = host_resize
        # Pipelined mode: dispatch frame N, return frame N-1's (already
        # computed) result — the device->host fetch overlaps the next frame's
        # compute, hiding the dispatch roundtrip. Scores/state lag one frame.
        self.pipelined = pipelined
        self._pending = None
        self._warmed_shape = None

        size = config["data"]["image_size"]
        self.height, self.width, self.channels = int(size[0]), int(size[1]), int(size[2])

        # device-resident state
        self.ring = jnp.zeros((self.RING_SIZE, self.height, self.width, self.channels), jnp.float32)
        self.ring_idx = 0
        self.ring_filled = 0
        self.score_state: StreamScoreState = stream_score.init_state(self.height, self.width)
        # Replay buffer is held PADDED to a fixed capacity with a row-validity
        # weight vector: the CL step's jit shape is then independent of how
        # many images a loaded replay file contains, so loading/replacing a
        # replay buffer mid-stream never retraces (at 90-200 s per compile on
        # a tunneled runtime, a retrace stalls the stream). Weight-0 rows drop
        # out of every loss statistic exactly (compute_loss weights=...).
        self.replay_capacity = int(replay_capacity)
        self.replay_buffer: Optional[jnp.ndarray] = None
        self.replay_n = 0
        self.replay_buffer_paths: Optional[list] = None

        # CL metric persistence (reference TensorBoard CallbackList epoch
        # logging, camera_streamer_qt.py:160-168, :1410-1416): each CL epoch's
        # loss dict + anomaly_score/anomaly_score_ma lands in the writer.
        self.metrics = metrics

        # per-task CDF thresholding (BASELINE config #3): the reference ships
        # CDFObject with no importers (SURVEY.md section 2 L6 — the intended
        # per-task threshold mechanism); here anomaly_score_method 'cdf' keeps
        # an empirical CDF over the recent score history and thresholds at
        # cdf_quantile. new_task() resets it when the CL task switches.
        from collections import deque

        self._score_history: deque = deque(maxlen=1024)
        self._cdf = None
        self._cdf_dirty = 0
        self._task_scored = 0  # frames scored since the last new_task()

        # mutable dials (reference GUI spinboxes)
        self.enable_cont_learning = False
        self.enable_anomaly_state = True
        self.anomaly_score = 0.0
        self.anomaly_score_ma = 0.0
        self.anomalous_state = False
        self.anomalous_start_time: Optional[float] = None
        self.cl_epochs = 0
        self.last_epoch_loss: Optional[dict] = None
        self.model_changed_flag = False
        self.schedule_model_save_flag = True
        self._last_inference_t = 0.0
        self._last_cl_t = 0.0
        # seeded from the first tick's clock (wall OR injected `now`) so a
        # simulated/replayed timeline keeps the autosave cadence consistent
        self._last_autosave_t: Optional[float] = None

        # recording
        self.record_dir: Optional[str] = None
        self.record_instance_dir: Optional[str] = None
        self.recording_flag = False
        self.anomaly_score_map: dict = {}
        self._last_record_t = 0.0
        self.record_period_ms = 500.0

        # timing EMA (reference process_rate :1130-1131)
        self.process_rate = 0.0
        self.timings: dict = {}

        # CL resources (optimizer moments + the train-step jit) are
        # allocated lazily on first use: an inference-only stream must not
        # hold multi-GB Adam moments on the chip (the flagship's are ~2x
        # the 2.7 GB param bytes). MultiCameraEngine._ensure_cl pattern.
        self._cl_step_j = None
        self._build_jits()

    # ------------------------------------------------------------------ jits
    def _refresh_serve_params(self) -> None:
        """Snapshot the params used by the inference dispatch (re-quantizing
        when the int8 path is on). Called at build time and after CL steps."""
        from trustedai_cl_vae_ad_tpu.ops.quant import serving_forward

        _, self._serve_params = serving_forward(
            self.model.core, self.model.params, quantize=self.quantized
        )

    def _build_jits(self):
        from trustedai_cl_vae_ad_tpu.ops.quant import serving_forward

        core = self.model.core
        out_hw = (self.height, self.width)
        forward, self._serve_params = serving_forward(
            core, self.model.params, quantize=self.quantized,
            qparams=self._qparams,
        )

        def infer_score(params, ring, idx, frame_u8, maps, scalars, alpha, seed_ring):
            x = frame_u8.astype(jnp.float32) / 255.0
            b = x[None]
            if x.shape[:2] != out_hw:
                b = jax.image.resize(
                    b, (1, out_hw[0], out_hw[1], x.shape[2]), method="linear", antialias=True
                )
            img = b[0]
            # first frame seeds EVERY ring slot (reference DataQueue copies
            # the initial frame to all entries, camera_streamer_qt.py:67-69 —
            # otherwise early CL steps would train on all-zero frames).
            # lax.cond keeps the steady-state path a single-slot update
            # instead of a full-ring select every frame.
            ring = jax.lax.cond(
                seed_ring,
                lambda: jnp.broadcast_to(b, ring.shape),
                lambda: jax.lax.dynamic_update_slice(ring, b, (idx, 0, 0, 0)),
            )
            x_hat = forward(params, b)[0]
            state, norm, score, count = stream_score.stream_score_step(
                StreamScoreState(maps, scalars), img, x_hat, alpha
            )
            norm_u8 = jnp.clip(jnp.round(255.0 * norm), 0, 255).astype(jnp.uint8)
            rec_u8 = jnp.clip(jnp.round(255.0 * x_hat), 0, 255).astype(jnp.uint8)
            score_count = jnp.stack([score, count])  # one packed scalar fetch
            return ring, state.maps, state.scalars, norm_u8, rec_u8, score_count

        self._infer_score_j = jax.jit(infer_score, donate_argnums=(1, 4, 5))

    def warmup(self, frame_shape=None, cl: bool = False) -> None:
        """Pre-compile the per-frame dispatch (and optionally the CL step)
        BEFORE the first camera frame arrives.

        On remote-compile runtimes the first jit of the flagship costs
        90-200 s — paid inside process_frame for the first real frame (and
        again inside the first CL step) unless warmed here. Uses
        ``jit.lower(...).compile()``: populates the COMPILE cache without
        executing, so the scorer state / ring-seeding / CL ring are
        untouched. The first real call still re-traces (seconds of host
        work — jax's call cache only fills on execution); it's the compile,
        the dominant cost, that is front-loaded.

        ``frame_shape``: (H, W, C) the cameras will deliver (default: the
        model's native resolution; pass (1080, 1920, 3) for raw RTSP).
        ``cl``: also compile the continual-learning step (allocates the
        optimizer moments — CL-sized device memory).
        """
        shape = tuple(frame_shape) if frame_shape is not None else (
            self.height, self.width, self.channels)
        self._infer_score_j.lower(
            self._serve_params, self.ring, 0,
            jnp.zeros(shape, jnp.uint8),
            self.score_state.maps, self.score_state.scalars,
            jnp.float32(self.stream_error_ma), jnp.bool_(True),
        ).compile()
        # only after .compile() returns: a failed/aborted warmup must not
        # leave a stale shape that triggers a spurious mismatch warning
        self._warmed_shape = shape
        if cl:
            self._ensure_cl()
            if self.replay_buffer is not None:
                # with a replay buffer the CL step only ever runs the
                # ring ⊕ capacity-padded-replay shape (_do_cl_step) — warm
                # THAT one (load the replay before calling warmup, as the
                # CLIs do; loading it after re-pays the first CL compile)
                stacked = jnp.zeros(
                    (self.RING_SIZE + self.replay_buffer.shape[0],
                     self.height, self.width, self.channels), self.ring.dtype)
            else:
                stacked = jnp.zeros_like(self.ring)
            weights = jnp.ones(stacked.shape[0], jnp.float32)
            # a fresh key with the right aval — NOT _next_rng(), which would
            # advance the model's rng stream and change later CL numerics
            self._cl_step_j.lower(
                self.model.params, self.model.opt_state, stacked, weights,
                jax.random.PRNGKey(0),
            ).compile()

    def _ensure_cl(self) -> None:
        """Lazily compile the optimizer (allocating Adam moments on device)
        and build the CL train-step jit. Raises on int8-checkpoint boots:
        there are no float params to train."""
        if self._cl_step_j is not None:
            return
        if self.model.params is None:
            raise RuntimeError(
                "continual learning needs float params, but this engine was "
                "booted from an int8 checkpoint (inference-only). Reload "
                "without int8_checkpoint_boot to train."
            )
        if self.model.optimizer is None:
            self.model.compile()
        core = self.model.core
        optimizer = self.model.optimizer

        def cl_step(params, opt_state, stacked, weights, rng):
            def loss_fn(p):
                loss_dict, x_hat = core.compute_loss(
                    p, stacked, training=True, return_inf=True, rng=rng,
                    weights=weights,
                )
                return loss_dict["loss"], (loss_dict, x_hat)

            grads, (loss_dict, x_hat) = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_dict, x_hat

        self._cl_step_j = jax.jit(cl_step, donate_argnums=(0, 1))

    # -------------------------------------------------------------- main path
    def process_frame(self, frame_u8: np.ndarray, now: Optional[float] = None,
                      tag: object = None) -> Optional[FrameResult]:
        """Run inference + scoring (+ CL at its cadence) for one RGB frame.

        Returns None when inside the inference hold-off period (reference
        :1274-1279). Mirrors update_inference_draws (:1263-1461).
        """
        t_start = time.perf_counter()
        now = time.monotonic() if now is None else now
        if (now - self._last_inference_t) * 1000.0 < self.inference_period_ms:
            return None
        self._last_inference_t = now

        frame_u8 = np.ascontiguousarray(frame_u8)
        if self.host_resize and frame_u8.shape[:2] != (self.height, self.width):
            try:
                import cv2

                # cv2.resize takes (width, height); tensor axes are (H, W)
                frame_u8 = cv2.resize(
                    frame_u8, (self.width, self.height), interpolation=cv2.INTER_AREA
                )
            except ImportError:
                pass  # fall through to device resize
        if self._warmed_shape is not None and frame_u8.shape != self._warmed_shape:
            # warn ONCE: the pre-compiled executable won't be hit — the user
            # pays the first-frame compile they tried to front-load
            print(f"warmup shape {self._warmed_shape} != delivered frame "
                  f"{frame_u8.shape}: recompiling (pass --warmup HxW matching "
                  f"the camera, or use --host-resize)")
            self._warmed_shape = None
        alpha = jnp.float32(self.stream_error_ma)
        idx = self.ring_idx = (self.ring_idx + 1) % self.RING_SIZE
        self.ring_filled = min(self.ring_filled + 1, self.RING_SIZE)

        from trustedai_cl_vae_ad_tpu.utils.profiling import defer_signals

        # the dispatch donates the ring + scorer state: defer signal delivery
        # past the re-assignment so an interrupt never strands deleted buffers
        with defer_signals():
            (self.ring, maps, scalars, norm_u8, rec_u8, score_count) = self._infer_score_j(
                self._serve_params, self.ring, idx, jnp.asarray(frame_u8),
                self.score_state.maps, self.score_state.scalars, alpha,
                jnp.bool_(self.ring_filled == 1),
            )
            self.score_state = StreamScoreState(maps, scalars)
        record_frame = frame_u8
        if self.pipelined:
            # keep the raw frame (and its tag) with its in-flight result so
            # recording/stats pair frame N-1's image with frame N-1's score
            pending, self._pending = self._pending, (score_count, norm_u8, rec_u8, frame_u8, tag)
            if pending is None:
                return None  # warmup: first frame's result arrives next call
            score_count, norm_u8, rec_u8, record_frame, tag = pending
        score_count = np.asarray(score_count)  # single small device->host fetch
        score, count = score_count[0], score_count[1]
        t_infer = time.perf_counter()

        # continual learning at its cadence (reference :1306-1353)
        cl_stepped = False
        loss = None
        if (
            self.enable_cont_learning
            and (now - self._last_cl_t) * 1000.0 > self.continuous_learning_period_ms
        ):
            self._last_cl_t = now
            loss = self._do_cl_step()
            cl_stepped = True
        t_cl = time.perf_counter()

        score_f = float(score)
        self.anomaly_score = score_f
        self._record_score(score_f)
        self.check_anomalous_state(now)
        ma = self.anomaly_ma_weight * self.anomaly_score_ma + (1.0 - self.anomaly_ma_weight) * score_f
        if not np.isnan(ma):  # reference :1407-1408
            self.anomaly_score_ma = ma

        result = FrameResult(
            score=score_f,
            score_ma=self.anomaly_score_ma,
            pixel_count=float(count),
            anomalous=self.anomalous_state,
            _norm_dev=norm_u8,
            _rec_dev=rec_u8,
            cl_stepped=cl_stepped,
            loss=loss,
            tag=tag,
        )

        self._maybe_record(record_frame, result, now)
        self._maybe_autosave(now)

        t_end = time.perf_counter()
        self.timings = {
            "infer_s": t_infer - t_start,
            "cl_s": t_cl - t_infer,
            "record_s": t_end - t_cl,
            "total_s": t_end - t_start,
        }
        self.process_rate = 0.9 * self.timings["total_s"] + 0.1 * self.process_rate
        return result

    def flush(self, now: Optional[float] = None) -> Optional[FrameResult]:
        """Pipelined mode: fetch the last in-flight frame's result."""
        if not self.pipelined or self._pending is None:
            return None
        now = time.monotonic() if now is None else now
        score_count, norm_u8, rec_u8, record_frame, tag = self._pending
        self._pending = None
        score_count = np.asarray(score_count)
        score_f = float(score_count[0])
        self.anomaly_score = score_f
        self._record_score(score_f)
        self.check_anomalous_state(now)
        ma = self.anomaly_ma_weight * self.anomaly_score_ma + (1.0 - self.anomaly_ma_weight) * score_f
        if not np.isnan(ma):
            self.anomaly_score_ma = ma
        result = FrameResult(
            score=score_f,
            score_ma=self.anomaly_score_ma,
            pixel_count=float(score_count[1]),
            anomalous=self.anomalous_state,
            _norm_dev=norm_u8,
            _rec_dev=rec_u8,
            tag=tag,
        )
        self._maybe_record(record_frame, result, now)
        return result

    def _do_cl_step(self) -> dict:
        """Gradient step on ring [+ replay] (reference :1319-1353).

        The replay buffer is capacity-padded; padded rows carry weight 0 and
        contribute to no statistic, so the jitted step has exactly two shapes
        ever: (ring,) and (ring + capacity,) — replay size changes don't
        retrace.
        """
        self._ensure_cl()
        if self.replay_buffer is not None:
            stacked = jnp.concatenate([self.ring, self.replay_buffer], axis=0)
            weights = np.zeros(stacked.shape[0], np.float32)
            weights[: self.RING_SIZE + self.replay_n] = 1.0
            weights = jnp.asarray(weights)
        else:
            stacked = self.ring
            weights = jnp.ones(self.RING_SIZE, jnp.float32)
        rng = self.model._next_rng()
        from trustedai_cl_vae_ad_tpu.utils.profiling import defer_signals

        # donating step: see VAEModel.train_step_and_run
        with defer_signals():
            (self.model.params, self.model.opt_state, loss, _x_hat) = self._cl_step_j(
                self.model.params, self.model.opt_state, stacked, weights, rng
            )
        self.cl_epochs += 1
        self._refresh_serve_params()  # serving copy tracks the trained params
        # one pipelined fetch for the whole dict — per-scalar float() costs a
        # round-trip each (12 keys x RTT dominated the CL step on the tunnel)
        loss = {k: float(v) for k, v in jax.device_get(loss).items()}
        loss["anomaly_score"] = self.anomaly_score
        loss["anomaly_score_ma"] = self.anomaly_score_ma
        self.last_epoch_loss = loss
        self.model_changed_flag = True
        if self.metrics is not None:
            self.metrics.log(self.cl_epochs, loss, prefix="cl/")
        return loss

    def set_learning_rate(self, lr: float) -> None:
        # the lr dial is a CL control: dialing it compiles the optimizer
        # (allocating its moments) if that hasn't happened yet
        self._ensure_cl()
        self.model.set_learning_rate(lr)

    def set_img_noise(self, beta: float) -> None:
        """GUI img-noise dial -> model.beta (reference :1331-1336).

        Parity note: in the reference, model.beta only fuzzes the encoder
        input when encode() is called with training=True — and the training
        loss path never does (abstract_cvae.py:139-143 calls encode without
        training). So this dial is stored but has no effect on CL training,
        exactly as in the reference.
        """
        self.model.beta = beta

    # ------------------------------------------------------- state machine
    def toggle_anomalous_state(self, state: bool, now: Optional[float] = None) -> None:
        if self.enable_anomaly_state:
            if state and not self.anomalous_state:
                self.anomalous_start_time = time.monotonic() if now is None else now
            self.anomalous_state = state
        else:
            self.anomalous_state = False

    def new_task(self, reset_scorer: bool = False) -> None:
        """Continual-learning task boundary: reset the per-task score CDF so
        the threshold re-derives from the new task's score distribution.

        The streaming-scorer EMA state is KEPT by default: it is an
        exponential average that re-adapts to the new scene on its own,
        whereas re-seeding it from zero rails the score at the z-cap for
        dozens of frames — a measured false-alarm storm at every task
        boundary (benchmarks/cl_quality.py). Pass ``reset_scorer=True`` for
        a hard reset (e.g. a physical camera swap where the resolution or
        exposure regime changes)."""
        self._score_history.clear()
        self._cdf = None
        self._cdf_dirty = 0
        self._task_scored = 0
        if reset_scorer:
            self.score_state = stream_score.init_state(self.height, self.width)
        self.anomaly_score_ma = 0.0

    def _record_score(self, score_f: float) -> None:
        """Append a score to the per-task CDF history.

        ``anomaly_settings['cdf_warmup_skip']`` (optional, default 0) drops
        the first K post-new_task() scores from the history: right after a
        task switch the scorer EMAs are re-seeding and scores transiently
        rail at the z-cap (sqrt(alpha/(1-alpha))); folding that transition
        storm into the CDF pins the per-task quantile at the cap and the
        threshold never fires again (measured in benchmarks/cl_quality.py).
        Alarming behavior during the transition is unchanged — only the
        threshold statistics ignore it."""
        self._task_scored += 1
        if not np.isfinite(score_f):
            return
        skip = 0
        if self.anomaly_settings is not None:
            skip = int(self.anomaly_settings.get("cdf_warmup_skip", 0))
        if self._task_scored <= skip:
            return
        self._score_history.append(score_f)
        self._cdf_dirty += 1

    def current_threshold(self) -> Optional[float]:
        """Active anomaly threshold: fixed, or the per-task CDF quantile.
        None when the engine was built without anomaly_settings (scoring
        runs, but no state machine is configured).

        The cdf method's A/B against its own fixed-threshold control
        (benchmarks/cl_quality.py, QUALITY_r5 -> r6) shaped three defaults:

          * ``cdf_floor`` (default: the configured fixed threshold) — the
            adaptive threshold is max(floor, extrapolated quantile). The
            normal-scaled tail extrapolation UNDER-estimates heavy-tailed
            quiet-task score distributions (measured: threshold 0.46-0.58 on
            tasks whose rare normal spikes hit 0.3-1.2 — steady false
            positives the fixed control never fires). The cdf's job is to
            RAISE the threshold on noisy tasks; the operator's configured
            threshold stays the sensitivity floor.
          * ``cdf_warmup_abstain`` (default True) — while the per-task CDF
            is still warming (fewer than 32 post-skip scores), return +inf
            instead of falling back to the fixed threshold: right after a
            task switch the scorer EMAs re-seed and scores transiently rail
            at the z-cap (measured: 15-18 boundary false alarms per run
            against scores that are pure re-seeding transients, flagship
            QUALITY_r5). A declared task switch means the model hasn't
            adapted yet — abstaining there trades ~(skip+32) frames of
            blindness for the whole false-alarm storm. Set False to restore
            the fixed-threshold fallback during warm-up.
          * ``cdf_window`` (default 96) — the CDF reads only the most
            recent scores, so a drifting/CL-improving stream's threshold
            tracks the current score regime instead of the whole task's
            non-stationary history.
        """
        if self.anomaly_settings is None:
            return None
        threshold = float(self.anomaly_settings.get("anomaly_score_threshold"))
        method = str(self.anomaly_settings.get("anomaly_score_method", "fixed"))
        if method.startswith("cdf"):
            if len(self._score_history) < 32:
                if bool(self.anomaly_settings.get("cdf_warmup_abstain", True)):
                    return float("inf")
                return threshold
            if self._cdf is None or self._cdf_dirty >= 16:
                from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject

                window = int(self.anomaly_settings.get("cdf_window", 96))
                hist = np.asarray(self._score_history)
                self._cdf = CDFObject(hist[-window:] if window > 0 else hist)
                self._cdf_dirty = 0
            from trustedai_cl_vae_ad_tpu.anomaly.cdf import threshold_from_cdf

            q = float(self.anomaly_settings.get("cdf_quantile", 0.995))
            # robust tail extrapolation by default: the raw empirical
            # quantile of a ~1k-sample history is the last few anomaly
            # scores themselves (threshold masking) — cdf.threshold_from_cdf
            robust = bool(self.anomaly_settings.get("cdf_robust_tail", True))
            adaptive = threshold_from_cdf(self._cdf, q, robust=robust)
            floor = float(self.anomaly_settings.get("cdf_floor", threshold))
            return max(adaptive, floor)
        return threshold

    def check_anomalous_state(self, now: Optional[float] = None) -> None:
        """Threshold + hold-period state machine (reference :898-914).

        ``now`` keeps the hold period on the same (injectable) clock as the
        inference/CL/record cadences — a replayed or simulated stream must
        not mix simulated timestamps with wall time.
        """
        now = time.monotonic() if now is None else now
        if self.anomaly_settings is not None:
            threshold = self.current_threshold()
            if self.anomaly_score > threshold:
                self.toggle_anomalous_state(True, now)
            elif self.anomalous_state and self.anomalous_start_time is not None:
                hold_s = float(self.anomaly_settings.get("anomalous_state_period_s"))
                if now - self.anomalous_start_time > hold_s:
                    self.toggle_anomalous_state(False, now)
        else:
            self.toggle_anomalous_state(False, now)

    # ----------------------------------------------------------- replay buffer
    def load_replay_buffer_from_file(self, input_filename: str) -> int:
        """txt (one path per line) or csv (first column) (reference :716-795)."""
        return self.load_replay_buffer_from_filelist(
            parse_replay_file(input_filename))

    def load_replay_buffer_from_filelist(self, filelist: list) -> int:
        imgs, ok_paths = decode_filelist_to_model_res(
            filelist, self.height, self.width, self.channels)
        n = len(ok_paths)
        if n == 0:
            return 0
        if n > self.replay_capacity:
            # grow in RING_SIZE buckets so repeated oversized loads converge
            # to few distinct shapes
            self.replay_capacity = -(-n // self.RING_SIZE) * self.RING_SIZE
        buf = np.zeros(
            (self.replay_capacity, self.height, self.width, self.channels), np.float32
        )
        buf[:n] = np.stack(imgs)
        self.replay_buffer = jnp.asarray(buf)
        self.replay_n = n
        self.replay_buffer_paths = ok_paths
        print(f"Replay Buffer Loaded: {n} images (capacity {self.replay_capacity})")
        return n

    # -------------------------------------------------------------- recording
    def begin_recording(self, record_dir: str) -> str:
        """Open a data_<ts> instance dir with the 5 PNG streams (ref :1021-1044)."""
        assert os.path.isdir(record_dir), record_dir
        self.record_dir = record_dir
        start_time = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        self.record_instance_dir = os.path.join(record_dir, f"data_{start_time}")
        for sub in ("frames", "err", "heatmap", "overlay", "rec"):
            os.makedirs(os.path.join(self.record_instance_dir, sub))
        self.anomaly_score_map = {}
        self.recording_flag = True
        print(f"Recording to: {self.record_instance_dir}")
        return self.record_instance_dir

    def _maybe_record(self, frame_u8: np.ndarray, result: FrameResult, now: float) -> None:
        if not self.recording_flag:
            return
        if (now - self._last_record_t) * 1000.0 < self.record_period_ms:
            return
        self._last_record_t = now
        ts = datetime.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
        basename = f"{ts}.png"
        self.anomaly_score_map[basename] = result.score
        record_frame_artifacts(self.record_instance_dir, basename, frame_u8,
                               result.norm_err_u8, result.reconstruction_u8,
                               self.height, self.width)

    def terminate_recording(self) -> Optional[str]:
        """Close recording: COCO labels.json with anomaly-score annotations +
        model snapshot (reference :1050-1102)."""
        self.recording_flag = False
        d = self.record_instance_dir
        if d is None or not os.path.isdir(d):
            return None
        labels_filename = write_coco_labels(d, self.anomaly_score_map)
        self.save_model_to_dir(os.path.join(d, "model"))
        return labels_filename

    # ------------------------------------------------------------ model save
    def save_model_to_dir(self, model_dir: str, saver=None) -> Optional[str]:
        """Checkpoint + config.yml with embedded cam_info + replay paths
        (reference save_model_to_dir :946-988). ``saver`` (an AsyncSaver)
        backgrounds the weight write — autosave_cycle passes the engine's."""
        return save_model_dir(self.model, self.config, model_dir,
                              cam_info=self.cam_info,
                              replay_paths=self.replay_buffer_paths,
                              saver=saver)

    def _get_async_saver(self):
        """Engine-owned AsyncSaver when async_autosave is on (lazy — an
        engine that never autosaves never spawns the writer threads)."""
        if not self.async_autosave:
            return None
        if self._async_saver is None:
            from trustedai_cl_vae_ad_tpu.train.checkpoint import AsyncSaver

            self._async_saver = AsyncSaver()
        return self._async_saver

    def drain_autosaves(self) -> None:
        """Block until any in-flight background autosave lands on disk, then
        release the writer threads. Call before process exit — an unfinished
        background write cut off by interpreter teardown is a lost save."""
        if self._async_saver is not None:
            self._async_saver.close()
            self._async_saver = None

    def save_model_to_dir_by_date(self, model_dir: str) -> Optional[str]:
        now = datetime.datetime.now()
        return self.save_model_to_dir(
            os.path.join(os.path.abspath(model_dir), f"date_{now.strftime('%Y%m%d_%H%M%S')}")
        )

    def schedule_model_save(self) -> None:
        """Request a cache save at the next tick IF the model is dirty
        (reference :915-916; the flag is consumed either way, :992-994)."""
        self.schedule_model_save_flag = True

    def schedule_model_save_override(self) -> None:
        """Force a cache save at the next tick even if clean (the reference's
        manual action sets both flags, :919-923)."""
        self.schedule_model_save_flag = True
        self.model_changed_flag = True

    def _maybe_autosave(self, now: float) -> None:
        """Autosave to the cache dir, mirroring the reference exactly: the
        5-minute timer (:251-253) only SETS the schedule flag; each tick's
        save_model_to_cache (:991-1008) consumes the flag and saves iff the
        model is dirty."""
        autosave_cycle(self, now)


def record_frame_artifacts(instance_dir: str, basename: str,
                           frame_u8: np.ndarray, norm_err_u8: np.ndarray,
                           reconstruction_u8: np.ndarray,
                           height: int, width: int) -> None:
    """Write one tick's 5 recording PNG streams into an instance dir
    (frames/err/heatmap/overlay/rec — reference :1021-1044). Shared by the
    single-stream and multicam engines."""
    from trustedai_cl_vae_ad_tpu.viz.plots import jet_heatmap, overlay_heatmap, save_rgb

    heatmap = jet_heatmap(norm_err_u8)
    # the reference blends the heatmap with the model-input IMAGE, not the
    # reconstruction (camera_streamer_qt.py:1420 — img[-1] is the resized
    # input); resize the raw frame to model size on host if needed
    base_img = frame_u8
    if base_img.shape[:2] != (height, width):
        from PIL import Image as _Image

        # PIL can't build an image from (H,W,1); squeeze, resize, restore the
        # channel axis so the overlay blend below still broadcasts
        single = base_img.ndim == 3 and base_img.shape[-1] == 1
        base_img = np.asarray(
            _Image.fromarray(base_img[..., 0] if single else base_img)
            .resize((width, height), _Image.BILINEAR),
            np.uint8,
        )
        if single:
            base_img = base_img[..., None]
    overlay = overlay_heatmap(norm_err_u8, base_img)
    save_rgb(frame_u8, os.path.join(instance_dir, "frames", basename))
    save_rgb(norm_err_u8, os.path.join(instance_dir, "err", basename))
    save_rgb(heatmap, os.path.join(instance_dir, "heatmap", basename))
    save_rgb(overlay, os.path.join(instance_dir, "overlay", basename))
    save_rgb(reconstruction_u8, os.path.join(instance_dir, "rec", basename))


def write_coco_labels(instance_dir: str, anomaly_score_map: dict) -> str:
    """COCO labels.json over instance_dir/frames with anomaly-score
    annotations (reference :1050-1102). Shared by both engines' recorders."""
    from PIL import Image

    img_filelist = []
    for dirpath, _, filenames in os.walk(os.path.join(instance_dir, "frames")):
        for f in sorted(filenames):
            if os.path.splitext(f)[1].lower() == ".png":
                img_filelist.append(os.path.join(dirpath, f))
    output_dict = {
        "info": {
            "year": datetime.datetime.now().year,
            "version": "1.0",
            "description": "custom",
            "contributor": "trustedai_cl_vae_ad_tpu",
        },
        "categories": [],
        "images": [],
        "annotations": [],
    }
    for idx, img_filepath in enumerate(img_filelist):
        with Image.open(img_filepath) as img:
            width, height = img.size
        img_basename = os.path.basename(img_filepath)
        output_dict["images"].append(
            {"id": idx, "width": width, "height": height, "file_name": img_basename}
        )
        score = anomaly_score_map.get(img_basename)
        if score is not None:
            output_dict["annotations"].append({img_basename: score})
    labels_filename = os.path.join(instance_dir, "labels.json")
    with open(labels_filename, "w") as f:
        json.dump(output_dict, f)
    return labels_filename


def save_model_dir(model, config: dict, model_dir: str, cam_info=None,
                   replay_paths=None, saver=None) -> str:
    """Checkpoint + config.yml (+ embedded cam_info, + replay provenance
    CSV) — the log-dir save both engines share (reference :946-988).
    With ``saver`` the weight write backgrounds (the config/CSV sidecars are
    cheap host writes and stay synchronous)."""
    os.makedirs(model_dir, exist_ok=True)
    # int8-boot model stand-ins (QuantizedServingModel) implement only the
    # plain save signature — fall back to a synchronous save for them
    # rather than assuming every model grew the ``saver`` parameter
    import inspect

    if saver is not None and "saver" in inspect.signature(model.save_model).parameters:
        model.save_model(model_dir, saver=saver)
    else:
        model.save_model(model_dir)
    output_config = deepcopy(config)
    if cam_info:
        output_config["cam_info"] = cam_info
    save_config(output_config, os.path.join(model_dir, "config.yml"))
    if replay_paths:
        with open(os.path.join(model_dir, "replay_buffer_paths.csv"), "w", newline="") as f:
            writer = csv.writer(f)
            for row in replay_paths:
                writer.writerow([row])
    print(f"Saved Model to {model_dir}")
    return model_dir


def autosave_cycle(eng, now: float) -> None:
    """The shared autosave state machine over an engine's (model_cache_dir,
    autosave_period_s, _last_autosave_t, schedule_model_save_flag,
    model_changed_flag, save_model_to_dir): the period timer only SETS the
    schedule flag (reference :251-253); each tick consumes the flag and
    saves iff the model is dirty (:991-1008); a failed save keeps the model
    DIRTY so the next schedule retries."""
    if eng.model_cache_dir is None:
        return
    if eng._last_autosave_t is None:
        eng._last_autosave_t = now
    if now - eng._last_autosave_t >= eng.autosave_period_s:
        eng._last_autosave_t = now
        eng.schedule_model_save_flag = True  # the reference's QTimer
    if not eng.schedule_model_save_flag:
        return
    eng.schedule_model_save_flag = False  # consumed (reference :992-994)
    if not eng.model_changed_flag:
        return
    # a transient save failure (disk full, permissions) must not kill the
    # caller's frame loop (reference :1004-1008 prints and carries on).
    # With async_autosave the weights background-write after the D2H copy;
    # a failure of the BACKGROUND write surfaces at the NEXT save's drain —
    # re-dirtying here makes the retry unconditional (CL usually re-dirties
    # anyway, but enable_cont_learning is mutable: with CL toggled off after
    # the failed round, a clean flag would silently keep the stale cache
    # until exit).
    saver = getattr(eng, "_get_async_saver", lambda: None)()
    try:
        eng.save_model_to_dir(eng.model_cache_dir, saver=saver)
    except Exception as e:
        print(f"autosave failed (will retry at the next schedule): {e}")
        eng.model_changed_flag = True  # dirty again; the next schedule retries
        return
    eng.model_changed_flag = False


def parse_replay_file(input_filename: str) -> list:
    """Replay-buffer file -> existing image paths. txt (one path per line)
    or csv (first column) (reference :716-795)."""
    assert os.path.isfile(input_filename), input_filename
    ext = os.path.splitext(input_filename)[-1].lower()
    if ext == ".txt":
        with open(input_filename) as f:
            paths = [os.path.normpath(r.strip()) for r in f if r.strip()]
    elif ext == ".csv":
        with open(input_filename) as f:
            paths = [row[0] for row in csv.reader(f) if row]
    else:
        raise ValueError(f"Unrecognized extension: {ext}")
    return [p for p in paths if os.path.isfile(p)]


def decode_filelist_to_model_res(filelist: list, height: int, width: int,
                                 channels: int):
    """Worker-pool decode + device preprocess of a replay filelist to model
    resolution. Returns (list of f32 HWC arrays, abs paths of readable files).

    Decode is ordered and skips unreadable files so a mid-stream buffer load
    doesn't stall the engine thread for the full serial decode time. Device
    preprocess runs in FIXED-SIZE chunks grouped by native shape: the jit
    cache then holds one shape per source resolution, independent of how
    many images a load contains (a per-image dispatch paid a device round
    trip each; a whole-group dispatch would retrace per distinct group
    length — 90-200 s per compile on remote runtimes)."""
    from trustedai_cl_vae_ad_tpu.data.ingest import preprocess_batch
    from trustedai_cl_vae_ad_tpu.data.pipeline import ParallelDecodeIterable

    decoded = [(img, os.path.abspath(p)) for img, p in ParallelDecodeIterable(filelist)]
    if not decoded:
        return [], []
    CHUNK = 32
    target = [height, width, channels]
    by_shape: dict = {}
    for i, (img, _p) in enumerate(decoded):
        by_shape.setdefault(img.shape, []).append(i)
    imgs = [None] * len(decoded)
    for idxs in by_shape.values():
        for c0 in range(0, len(idxs), CHUNK):
            block = idxs[c0 : c0 + CHUNK]
            stack = [decoded[i][0] for i in block]
            while len(stack) < CHUNK:  # pad tail to the one chunk shape
                stack.append(stack[-1])
            proc = np.asarray(preprocess_batch(np.stack(stack), target))
            for j, i in enumerate(block):
                imgs[i] = proc[j]
    return imgs, [p for _img, p in decoded]


def load_engine_from_directory(log_dir: str, int8_checkpoint_boot: bool = False,
                               **kwargs) -> StreamingEngine:
    """Load model+config from a log dir; restores replay buffer if recorded
    (reference load-model flow :630-696).

    ``int8_checkpoint_boot``: with ``quantize=True`` and a
    ``<log_dir>/quantized`` tree present (tools/quantize_checkpoint.py),
    boot from the int8 checkpoint WITHOUT materializing the float params —
    half the upload, no on-device quantization pass (the serve.py boot
    path, BENCH_NOTES r5). Inference-only: continual learning raises.
    """
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    if int8_checkpoint_boot and kwargs.get("quantize"):
        from trustedai_cl_vae_ad_tpu.ops.quant import (
            has_quantized_checkpoint,
            load_int8_serving_model,
        )

        if has_quantized_checkpoint(log_dir):
            model, config = load_int8_serving_model(log_dir)
            engine = StreamingEngine(model, config,
                                     cam_info=config.get("cam_info"),
                                     qparams=model.qparams, **kwargs)
            replay_csv = os.path.join(log_dir, "replay_buffer_paths.csv")
            if os.path.exists(replay_csv):
                engine.load_replay_buffer_from_file(replay_csv)
            return engine
        print(f"no quantized checkpoint under {log_dir} — float boot "
              "(tools/quantize_checkpoint.py writes one)")

    # CL resume: restore Adam moments when checkpointed (compiles as needed);
    # an unconditional compile() here would re-init and wipe them. One read
    # restores params AND moments (a second load_model call would re-read and
    # re-upload the full weight tree). An engine without checkpointed moments
    # stays uncompiled — StreamingEngine allocates CL state lazily.
    model, config = load_model_from_directory(log_dir, restore_optimizer=True)
    engine = StreamingEngine(model, config, cam_info=config.get("cam_info"), **kwargs)
    replay_csv = os.path.join(log_dir, "replay_buffer_paths.csv")
    if os.path.exists(replay_csv):
        engine.load_replay_buffer_from_file(replay_csv)
    return engine


def combine_datasets(src_dirs: list, dest_dir: str) -> str:
    """Merge recorded datasets: copy trees, concatenate labels.json images
    (reference combine_datasets_action :798-850)."""
    assert os.path.isdir(dest_dir)
    labels = []
    for src_dir in src_dirs:
        label_filepath = os.path.join(src_dir, "labels.json")
        if not os.path.exists(label_filepath):
            continue
        with open(label_filepath) as f:
            labels.append(json.load(f))
        for root_path, _dirs, files in os.walk(src_dir):
            d_dir = root_path.replace(src_dir, dest_dir, 1)
            os.makedirs(d_dir, exist_ok=True)
            for f in files:
                src_file = os.path.join(root_path, f)
                dst_file = os.path.join(d_dir, f)
                if os.path.exists(dst_file):
                    os.remove(dst_file)
                shutil.copy(src_file, d_dir)
    assert labels, "no labels.json found in any source directory"
    output_label = deepcopy(labels[0])
    for label_obj in labels[1:]:
        output_label["images"].extend(label_obj["images"])
    out_path = os.path.join(dest_dir, "labels.json")
    with open(out_path, "w") as f:
        json.dump(output_label, f)
    return out_path
