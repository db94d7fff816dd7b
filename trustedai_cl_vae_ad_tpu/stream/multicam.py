"""Multi-camera batched streaming inference + anomaly scoring.

The reference app drives ONE camera per process (camera_streamer_qt.py uses
a single entry of camera_list). On TPU the economical shape is the opposite:
batch K streams into one dispatch — the flagship forward is MXU-bound and
nearly free to widen, so K cameras cost barely more than one. This engine
keeps a batched scorer state (maps (K,2,H,W), scalars (K,6)) and runs
resize -> forward -> vmapped EMA scorer for all streams as a single jitted
program per tick.

Scope: inference + scoring + per-stream anomaly state machines + fleet
continual learning. CL here is ONE gradient step on the union of all
streams' recent frames (a device ring of the last ``cl_ring_ticks`` ticks
x K streams, dropped frames masked out by per-row loss weights) — the
shared weights learn every camera's scene at once, which is both the only
coherent semantics for a shared model and the TPU-economical shape (one
big batched train step instead of K small ones). A shared replay buffer
(same txt/csv formats) mixes into every fleet step; recording writes each
stream's 5 PNG streams + COCO labels into per-camera subtrees; autosave
persists the CL-trained weights on the single-stream engine's schedule.
Score math is identical to stream_score (vmapped jnp form — equivalence vs
K independent engines is tested).

Missing frames (a camera dropping a tick) are handled with a validity mask:
that stream's EMA state is left untouched and its score reports NaN for the
tick, like the reference's warmup NaNs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trustedai_cl_vae_ad_tpu.ops import stream_score
from trustedai_cl_vae_ad_tpu.utils.profiling import defer_signals as _defer_signals


@dataclass
class StreamStatus:
    score: float
    score_ma: float
    pixel_count: float
    anomalous: bool
    _norm_dev: object = None
    _rec_dev: object = None
    # memoized host copies: each np.asarray(dev) is a device->host round trip
    # (same rationale as engine.FrameResult._norm_np/_rec_np) — a GUI reading
    # the same map twice per tick must not pay 2x HxW transfers per stream
    _norm_np: object = None
    _rec_np: object = None

    @property
    def norm_err_u8(self) -> np.ndarray:
        if self._norm_np is None:
            self._norm_np = np.asarray(self._norm_dev)
        return self._norm_np

    @property
    def reconstruction_u8(self) -> np.ndarray:
        if self._rec_np is None:
            self._rec_np = np.asarray(self._rec_dev)
        return self._rec_np


class MultiCameraEngine:
    def __init__(
        self,
        model,
        config: dict,
        n_streams: int,
        anomaly_settings: Optional[dict] = None,
        stream_error_ma: float = 0.99,
        anomaly_ma_weight: float = 0.9,
        quantize: bool = False,
        continuous_learning_period_ms: float = 500.0,
        cl_ring_ticks: int = 4,
        metrics=None,
        model_cache_dir: Optional[str] = None,
        autosave_period_s: float = 5 * 60.0,
        replay_capacity: int = 64,
        pipelined: bool = False,
        mesh=None,
        qparams=None,
        async_autosave: bool = False,
    ):
        assert n_streams >= 1
        # background the periodic cache save (see StreamingEngine: the tick
        # resumes after the D2H copy instead of the full disk write); call
        # drain_autosaves() before exit. Fleet CL dirties every period, so
        # the stall this removes recurs at the autosave cadence.
        self.async_autosave = bool(async_autosave)
        self._async_saver = None
        if mesh is not None:
            # streams shard over the 'data' axis: K cameras per tick split
            # across chips, params replicated — the per-chip capacity story
            # (128 cams/chip, SERVING.md) scales horizontally
            assert n_streams % mesh.devices.size == 0, (
                f"n_streams {n_streams} must divide over {mesh.devices.size} devices")
        self.mesh = mesh
        self.model = model
        # ``qparams`` = pre-quantized tree (load_quantized_checkpoint): the
        # int8-checkpoint boot — model.params may be None; fleet CL raises
        self.quantized = bool(quantize) or qparams is not None
        self._qparams = qparams
        self.config = config
        self.n_streams = int(n_streams)
        if anomaly_settings is not None:
            from trustedai_cl_vae_ad_tpu.stream.engine import validate_anomaly_settings

            validate_anomaly_settings(anomaly_settings)
        self.anomaly_settings = anomaly_settings
        self.stream_error_ma = float(stream_error_ma)
        self.anomaly_ma_weight = float(anomaly_ma_weight)

        size = config["data"]["image_size"]
        self.height, self.width, self.channels = int(size[0]), int(size[1]), int(size[2])
        k = self.n_streams
        self.maps = jnp.zeros((k, 2, self.height, self.width), jnp.float32)
        self.scalars = jnp.zeros((k, 6), jnp.float32)

        self.score_ma = np.zeros(k, np.float64)
        self.anomalous = np.zeros(k, bool)
        self.anomalous_start = [None] * k

        # per-stream CDF thresholding (anomaly_score_method: 'cdf'), mirroring
        # the single-stream engine's per-task mechanism (stream/engine.py
        # current_threshold): each stream keeps its own score history so a
        # task/camera change on one stream re-derives only ITS threshold.
        from collections import deque

        self._score_history = [deque(maxlen=1024) for _ in range(k)]
        self._cdf = [None] * k
        self._cdf_dirty = [0] * k
        self._task_scored = [0] * k  # per-stream cdf_warmup_skip counters

        self._ref_shape = None  # pinned at the first tick (one jit shape)
        self._warm_pin = False  # _ref_shape came from warmup, not a real tick
        self._resize_warned = set()

        # pipelined mode: dispatch tick N, return tick N-1's results — the
        # device computes while the host fetches the next frames (single-
        # stream engine's pipelined flag, exact shift-by-one semantics)
        self.pipelined = bool(pipelined)
        self._pending = None
        self.last_emitted_tag = None

        # fleet continual learning (reference CL semantics :1319-1353, lifted
        # to K streams). Everything is allocated lazily on the first enabled
        # tick so an inference-only engine pays neither the optimizer-state
        # memory (2x params) nor the train-step compile.
        self.enable_cont_learning = False
        self.continuous_learning_period_ms = float(continuous_learning_period_ms)
        self.cl_ring_ticks = int(cl_ring_ticks)
        self.metrics = metrics
        self.cl_epochs = 0
        self.last_epoch_loss: Optional[dict] = None
        self.model_changed_flag = False
        self._last_cl_t = 0.0
        self._cl_ring = None  # (T, K, H, W, C) f32, model-resolution frames
        self._cl_valid: Optional[np.ndarray] = None  # (T, K) row weights
        self._cl_tick = 0
        self._cl_step_j = None
        self._store_tick_j = None

        # replay buffer shared across the fleet (the reference's CL stacks
        # ring + replay, camera_streamer_qt.py:1341-1344 — here the replay
        # regularizes the SHARED weights against forgetting while every
        # camera's live scene trains them). Capacity-padded like the
        # single-stream engine: padded rows carry weight 0, so the CL step
        # has exactly two jit shapes ever (with/without replay).
        self.replay_capacity = int(replay_capacity)
        self.replay_buffer = None  # (capacity, H, W, C) f32 device array
        self.replay_n = 0
        self.replay_buffer_paths: Optional[list] = None
        self._cl_step_replay_j = None

        # per-stream recording (the single-stream engine's 5-PNG-stream
        # instance-dir format, one cam<i>/ subtree per stream)
        self.recording_flag = False
        self.record_dir: Optional[str] = None
        self.record_instance_dir: Optional[str] = None
        self.record_period_ms = 500.0
        self._last_record_t = 0.0
        self._stream_names: Optional[List[str]] = None
        self._anomaly_score_maps: Optional[List[dict]] = None

        # autosave: fleet CL mutates the shared weights, so the multicam
        # engine keeps the single-stream engine's persistence semantics
        # (schedule flag set by the period timer, consumed per tick, saves
        # iff dirty, failure keeps the model dirty — reference :991-1008)
        self.model_cache_dir = model_cache_dir
        self.autosave_period_s = float(autosave_period_s)
        self.schedule_model_save_flag = False
        self._last_autosave_t: Optional[float] = None

        self._build_jit()

    def _host_resize(self, i: int, frame: np.ndarray, ref_shape) -> np.ndarray:
        """Bring a stream whose camera delivers a different resolution onto
        the pinned batch shape (host-side bilinear; warns once per stream)."""
        from PIL import Image

        if i not in self._resize_warned:
            self._resize_warned.add(i)
            print(
                f"multicam: stream {i} delivers {frame.shape}, resizing to "
                f"the pinned batch shape {ref_shape}"
            )
        if frame.ndim == 3 and frame.shape[-1] == 1:
            frame = frame[..., 0]  # PIL rejects (H, W, 1) arrays
        img = Image.fromarray(frame).resize((ref_shape[1], ref_shape[0]),
                                            Image.BILINEAR)
        out = np.asarray(img, np.uint8)
        if out.shape != tuple(ref_shape):  # channel mismatch
            if out.ndim == 2:  # gray -> replicate across ref channels
                out = np.broadcast_to(out[..., None], ref_shape).copy()
            elif ref_shape[-1] == 1:  # RGB -> single-channel: luminance
                lum = (0.299 * out[..., 0] + 0.587 * out[..., 1]
                       + 0.114 * out[..., 2])
                out = np.clip(np.round(lum), 0, 255).astype(np.uint8)[..., None]
            else:
                out = np.broadcast_to(out[..., :1], ref_shape).copy()
        return out

    def _build_jit(self):
        core = self.model.core
        out_hw = (self.height, self.width)
        # int8 big-dense kernels when quantized: the per-tick forward is
        # weight-streaming bound at multicam batch sizes, so halving the
        # dominant kernel bytes cuts tick time (ops/quant.py)
        from trustedai_cl_vae_ad_tpu.ops.quant import serving_forward

        forward, self._serve_params = serving_forward(
            core, self.model.params, quantize=self.quantized,
            qparams=self._qparams,
        )

        def scorer_one(maps, scalars, img, x_hat, alpha, valid):
            state, norm, score, count = stream_score.stream_score_step_reference(
                stream_score.StreamScoreState(maps, scalars), img, x_hat, alpha
            )
            new_maps = jnp.where(valid, state.maps, maps)
            new_scalars = jnp.where(valid, state.scalars, scalars)
            score = jnp.where(valid, score, jnp.nan)
            count = jnp.where(valid, count, 0.0)
            return new_maps, new_scalars, norm, score, count

        def step(params, frames_u8, maps, scalars, alpha, valid):
            x = frames_u8.astype(jnp.float32) / 255.0
            if x.shape[1:3] != out_hw:
                x = jax.image.resize(
                    x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]),
                    method="linear", antialias=True,
                )
            x_hat = forward(params, x)
            maps, scalars, norm, score, count = jax.vmap(
                scorer_one, in_axes=(0, 0, 0, 0, None, 0)
            )(maps, scalars, x, x_hat, alpha, valid)
            norm_u8 = jnp.clip(jnp.round(255.0 * norm), 0, 255).astype(jnp.uint8)
            rec_u8 = jnp.clip(jnp.round(255.0 * x_hat), 0, 255).astype(jnp.uint8)
            score_count = jnp.stack([score, count], axis=1)  # (K, 2), one fetch
            # x (the model-resolution batch) also returns so the CL ring can
            # store it; it stays a device buffer and is dropped when CL is off
            return maps, scalars, norm_u8, rec_u8, score_count, x

        if self.mesh is None:
            self._step_j = jax.jit(step, donate_argnums=(2, 3))
        else:
            from trustedai_cl_vae_ad_tpu.parallel.mesh import (
                batch_sharding,
                replicate,
                replicated_sharding,
            )

            rep = replicated_sharding(self.mesh)
            bsh = batch_sharding(self.mesh)
            # params committed replicated ONCE — an uncommitted tree would
            # re-transfer on every tick's dispatch; scorer state lives
            # stream-sharded where it is consumed
            self._serve_params = replicate(self._serve_params, self.mesh)
            self.maps = jax.device_put(self.maps, bsh)
            self.scalars = jax.device_put(self.scalars, bsh)
            self._step_j = jax.jit(
                step, donate_argnums=(2, 3),
                in_shardings=(rep, bsh, bsh, bsh, rep, bsh),
                # score_count gathers replicated (one host fetch per tick);
                # maps/scalars/images stay stream-sharded on their chips
                out_shardings=(bsh, bsh, bsh, bsh, rep, bsh),
            )

    def warmup(self, frame_shape=None, cl: bool = False) -> None:
        """Pre-compile the per-tick dispatch (and optionally the fleet-CL
        jits) BEFORE cameras attach — StreamingEngine.warmup for the fleet.

        ``jit.lower(...).compile()`` populates the COMPILE cache without
        executing, so scorer state / the CL ring stay untouched (the first
        real tick still re-traces — seconds — but never re-compiles).

        Tentatively pins the batch shape to ``frame_shape`` (default: the
        model resolution). The pin is PROVISIONAL: if the first real tick
        delivers a different resolution, it re-pins to the delivered shape
        (the unwarmed semantics — device resize inside the jit, not a
        host resize to the warmed shape), warns once, and recompiles. A
        wrong ``frame_shape`` therefore wastes the warmup but never changes
        scoring numerics."""
        shape = tuple(frame_shape) if frame_shape is not None else (
            self.height, self.width, self.channels)
        if self._ref_shape is None:
            self._ref_shape = shape
            self._warm_pin = True  # provisional until the first real tick
        batch = jnp.zeros((self.n_streams, *self._ref_shape), jnp.uint8)
        self._step_j.lower(
            self._serve_params, batch, self.maps, self.scalars,
            jnp.float32(self.stream_error_ma),
            jnp.ones(self.n_streams, bool),
        ).compile()
        if cl:
            self._ensure_cl()
            self._store_tick_j.lower(
                self._cl_ring,
                jnp.zeros((self.n_streams, self.height, self.width,
                           self.channels), jnp.float32),
                jnp.int32(0),
            ).compile()
            n_ring = self.cl_ring_ticks * self.n_streams
            # fresh key, NOT _next_rng() — warmup must not perturb numerics
            key = jax.random.PRNGKey(0)
            if self.replay_buffer is not None:
                # with a shared replay buffer only the replay-stacked jit
                # ever runs (_do_cl_step) — warm that one
                weights = jnp.ones(n_ring + self.replay_buffer.shape[0],
                                   jnp.float32)
                self._cl_step_replay_j.lower(
                    self.model.params, self.model.opt_state, self._cl_ring,
                    self.replay_buffer, weights, key,
                ).compile()
            else:
                self._cl_step_j.lower(
                    self.model.params, self.model.opt_state, self._cl_ring,
                    jnp.ones(n_ring, jnp.float32), key,
                ).compile()

    def _refresh_serve_params(self) -> None:
        """Snapshot the params used by the inference dispatch (re-quantizing
        when the int8 path is on). Called after every CL step, mirroring the
        single-stream engine."""
        from trustedai_cl_vae_ad_tpu.ops.quant import serving_forward

        _, self._serve_params = serving_forward(
            self.model.core, self.model.params, quantize=self.quantized
        )
        if self.mesh is not None:
            from trustedai_cl_vae_ad_tpu.parallel.mesh import replicate

            self._serve_params = replicate(self._serve_params, self.mesh)

    # ------------------------------------------------------------ fleet CL
    def _ensure_cl(self) -> None:
        """Lazily allocate the CL ring, optimizer state, and train-step jit."""
        if self._cl_ring is not None:
            return
        if self.model.params is None:
            raise RuntimeError(
                "fleet continual learning needs float params, but this "
                "engine was booted from an int8 checkpoint (inference-only). "
                "Reload without int8_checkpoint_boot to train."
            )
        if self.model.optimizer is None:
            self.model.compile()
        t, k = self.cl_ring_ticks, self.n_streams
        self._cl_ring = jnp.zeros(
            (t, k, self.height, self.width, self.channels), jnp.float32
        )
        self._cl_valid = np.zeros((t, k), np.float32)

        ring_sh = rep = bsh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from trustedai_cl_vae_ad_tpu.parallel.mesh import (
                DATA_AXIS,
                batch_sharding,
                replicate,
                replicated_sharding,
            )

            rep = replicated_sharding(self.mesh)
            bsh = batch_sharding(self.mesh)
            # ring shards on the STREAM axis (dim 1) so each chip trains on
            # the frames it already scored; params/moments stay replicated
            # (plain dp — the stacked CL batch is the sharded dimension)
            ring_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
            self._cl_ring = jax.device_put(self._cl_ring, ring_sh)
            self.model.params = replicate(self.model.params, self.mesh)
            self.model.opt_state = replicate(self.model.opt_state, self.mesh)

        def store_tick(ring, x, tick):
            return jax.lax.dynamic_update_slice(
                ring, x.astype(ring.dtype)[None], (tick, 0, 0, 0, 0)
            )

        if self.mesh is None:
            self._store_tick_j = jax.jit(store_tick, donate_argnums=(0,))
        else:
            self._store_tick_j = jax.jit(
                store_tick, donate_argnums=(0,),
                in_shardings=(ring_sh, bsh, rep), out_shardings=ring_sh)

        core = self.model.core
        optimizer = self.model.optimizer

        def cl_step(params, opt_state, ring, replay, weights, rng):
            stacked = ring.reshape((-1,) + ring.shape[2:])
            if replay is not None:
                stacked = jnp.concatenate([stacked, replay], axis=0)

            def loss_fn(p):
                loss_dict, _x_hat = core.compute_loss(
                    p, stacked, training=True, return_inf=True, rng=rng,
                    weights=weights,
                )
                return loss_dict["loss"], loss_dict

            grads, loss_dict = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_dict

        no_replay = lambda p, s, ring, w, rng: cl_step(p, s, ring, None, w, rng)
        if self.mesh is None:
            self._cl_step_j = jax.jit(no_replay, donate_argnums=(0, 1))
            self._cl_step_replay_j = jax.jit(cl_step, donate_argnums=(0, 1))
        else:
            out_sh = (rep, rep, rep)
            self._cl_step_j = jax.jit(
                no_replay, donate_argnums=(0, 1),
                in_shardings=(rep, rep, ring_sh, rep, rep), out_shardings=out_sh)
            self._cl_step_replay_j = jax.jit(
                cl_step, donate_argnums=(0, 1),
                in_shardings=(rep, rep, ring_sh, bsh, rep, rep),
                out_shardings=out_sh)

    def _do_cl_step(self) -> Optional[dict]:
        """One gradient step on the fleet ring (all streams, masked rows).

        Mirrors StreamingEngine._do_cl_step: weight-0 rows (dropped frames /
        not-yet-filled ring slots) contribute to no loss statistic, so the
        jitted step has exactly one shape regardless of how many streams
        delivered a frame this tick."""
        if self._cl_valid is None or self._cl_valid.sum() == 0:
            return None  # nothing real in the ring yet
        rng = self.model._next_rng()
        if self.replay_buffer is not None:
            replay_w = np.zeros(self.replay_buffer.shape[0], np.float32)
            replay_w[: self.replay_n] = 1.0
            weights = jnp.asarray(
                np.concatenate([self._cl_valid.reshape(-1), replay_w]))
            with _defer_signals():  # donating step: see VAEModel.train_step_and_run
                (self.model.params, self.model.opt_state, loss) = self._cl_step_replay_j(
                    self.model.params, self.model.opt_state, self._cl_ring,
                    self.replay_buffer, weights, rng
                )
        else:
            weights = jnp.asarray(self._cl_valid.reshape(-1))
            with _defer_signals():
                (self.model.params, self.model.opt_state, loss) = self._cl_step_j(
                    self.model.params, self.model.opt_state, self._cl_ring, weights, rng
                )
        self.cl_epochs += 1
        self._refresh_serve_params()  # serving copy tracks the trained params
        # one pipelined fetch for the whole dict — per-scalar float() costs a
        # round-trip each (12 keys x RTT dominated the CL step on the tunnel)
        loss = {k: float(v) for k, v in jax.device_get(loss).items()}
        self.last_epoch_loss = loss
        self.model_changed_flag = True
        if self.metrics is not None:
            self.metrics.log(self.cl_epochs, loss, prefix="cl/")
        return loss

    def set_learning_rate(self, lr: float) -> None:
        if self.model.params is None:
            raise RuntimeError(
                "the lr dial is a CL control and this engine was booted "
                "from an int8 checkpoint (inference-only)")
        if self.model.optimizer is None:
            self.model.compile()
        self.model.set_learning_rate(lr)

    def set_img_noise(self, beta: float) -> None:
        """GUI img-noise dial -> model.beta (same dead-path parity note as
        StreamingEngine.set_img_noise)."""
        self.model.beta = beta

    # ----------------------------------------------------------- replay
    def load_replay_buffer_from_file(self, input_filename: str) -> int:
        """txt/csv of image paths -> fleet replay buffer (same file formats
        as the single-stream engine / reference :716-795)."""
        from trustedai_cl_vae_ad_tpu.stream.engine import parse_replay_file

        return self.load_replay_buffer_from_filelist(
            parse_replay_file(input_filename))

    def load_replay_buffer_from_filelist(self, filelist: list) -> int:
        from trustedai_cl_vae_ad_tpu.stream.engine import (
            decode_filelist_to_model_res,
        )

        imgs, ok_paths = decode_filelist_to_model_res(
            filelist, self.height, self.width, self.channels)
        n = len(ok_paths)
        if n == 0:
            return 0
        if n > self.replay_capacity:
            # grow in fleet-ring buckets so repeated oversized loads converge
            # to few distinct shapes
            ring_rows = self.cl_ring_ticks * self.n_streams
            self.replay_capacity = -(-n // ring_rows) * ring_rows
        if self.mesh is not None:  # batch-sharded replay must divide evenly
            d = int(self.mesh.devices.size)
            self.replay_capacity = -(-self.replay_capacity // d) * d
        buf = np.zeros(
            (self.replay_capacity, self.height, self.width, self.channels),
            np.float32,
        )
        buf[:n] = np.stack(imgs)
        self.replay_buffer = jnp.asarray(buf)
        if self.mesh is not None:
            from trustedai_cl_vae_ad_tpu.parallel.mesh import batch_sharding

            self.replay_buffer = jax.device_put(
                self.replay_buffer, batch_sharding(self.mesh))
        self.replay_n = n
        self.replay_buffer_paths = ok_paths
        print(f"Replay Buffer Loaded: {n} images (capacity {self.replay_capacity})")
        return n

    # ------------------------------------------------------------ recording
    def begin_recording(self, record_dir: str, names: Optional[List[str]] = None) -> str:
        """Open a data_<ts> instance dir with one cam subtree per stream,
        each holding the single-stream engine's 5 PNG streams
        (StreamingEngine.begin_recording / reference :1021-1044, per-cam)."""
        import datetime
        import os

        assert os.path.isdir(record_dir), record_dir
        if names is not None:
            assert len(names) == self.n_streams
        raw = list(names) if names else [f"cam{i}" for i in range(self.n_streams)]
        # cam_config names are user input and may collide — uniquify so two
        # 'gate' cameras don't interleave into one subtree. The renamed
        # candidate is re-checked too: ['gate','gate_1','gate'] must yield
        # gate_2, not a second gate_1.
        seen: set = set()
        self._stream_names = []
        for n in raw:
            cand, k = n, 0
            while cand in seen:
                k += 1
                cand = f"{n}_{k}"
            seen.add(cand)
            self._stream_names.append(cand)
        self.record_dir = record_dir
        ts = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        self.record_instance_dir = os.path.join(record_dir, f"data_{ts}")
        for name in self._stream_names:
            for sub in ("frames", "err", "heatmap", "overlay", "rec"):
                os.makedirs(os.path.join(self.record_instance_dir, name, sub))
        self._anomaly_score_maps = [{} for _ in range(self.n_streams)]
        self.recording_flag = True
        print(f"Recording to: {self.record_instance_dir}")
        return self.record_instance_dir

    def _maybe_record(self, batch: np.ndarray, valid: np.ndarray,
                      out: List[Optional[StreamStatus]], now: float) -> None:
        if not self.recording_flag:
            return
        if (now - self._last_record_t) * 1000.0 < self.record_period_ms:
            return
        self._last_record_t = now
        import datetime
        import os

        from trustedai_cl_vae_ad_tpu.stream.engine import record_frame_artifacts

        ts = datetime.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
        basename = f"{ts}.png"
        for i, r in enumerate(out):
            if r is None or not valid[i]:
                continue  # a dropped tick records nothing for that stream
            self._anomaly_score_maps[i][basename] = r.score
            record_frame_artifacts(
                os.path.join(self.record_instance_dir, self._stream_names[i]),
                basename, batch[i], r.norm_err_u8, r.reconstruction_u8,
                self.height, self.width)

    def terminate_recording(self) -> Optional[str]:
        """Close recording: per-stream COCO labels.json with anomaly-score
        annotations + ONE model snapshot for the whole fleet (the weights
        are shared) — StreamingEngine.terminate_recording per-cam."""
        import os

        from trustedai_cl_vae_ad_tpu.stream.engine import write_coco_labels

        self.recording_flag = False
        root = self.record_instance_dir
        if root is None or not os.path.isdir(root):
            return None
        for i, name in enumerate(self._stream_names):
            write_coco_labels(os.path.join(root, name),
                              self._anomaly_score_maps[i])
        self.save_model_to_dir(os.path.join(root, "model"))
        return root

    # ----------------------------------------------------------- model save
    def save_model_to_dir(self, model_dir: str, saver=None) -> str:
        """Checkpoint + config.yml + replay provenance — the same log-dir
        ABI every tool loads (StreamingEngine.save_model_to_dir minus
        cam_info, which is a single-stream concept)."""
        from trustedai_cl_vae_ad_tpu.stream.engine import save_model_dir

        return save_model_dir(self.model, self.config, model_dir,
                              replay_paths=self.replay_buffer_paths,
                              saver=saver)

    def _get_async_saver(self):
        if not self.async_autosave:
            return None
        if self._async_saver is None:
            from trustedai_cl_vae_ad_tpu.train.checkpoint import AsyncSaver

            self._async_saver = AsyncSaver()
        return self._async_saver

    def drain_autosaves(self) -> None:
        """Block until any in-flight background autosave lands; release the
        writer threads (see StreamingEngine.drain_autosaves)."""
        if self._async_saver is not None:
            self._async_saver.close()
            self._async_saver = None

    def schedule_model_save(self) -> None:
        self.schedule_model_save_flag = True

    def _maybe_autosave(self, now: float) -> None:
        """Same consume-the-flag/save-iff-dirty/stay-dirty-on-failure cycle
        as StreamingEngine (shared engine.autosave_cycle)."""
        from trustedai_cl_vae_ad_tpu.stream.engine import autosave_cycle

        autosave_cycle(self, now)

    def process_frames(
        self, frames: Sequence[Optional[np.ndarray]], now: Optional[float] = None,
        tag: object = None,
    ) -> List[Optional[StreamStatus]]:
        """Score one tick of frames (len == n_streams; None = dropped tick).

        ``tag``: caller's id for this tick; after the call,
        ``last_emitted_tag`` holds the tag of the tick the RETURNED results
        belong to (one tick behind in pipelined mode)."""
        assert len(frames) == self.n_streams, (len(frames), self.n_streams)
        now = time.monotonic() if now is None else now
        valid = np.array([f is not None for f in frames], bool)
        # dropped streams get a zero placeholder; the mask freezes their state.
        # The batch shape is pinned at the first tick (one jit shape for the
        # session); streams delivering a different resolution are resized on
        # host — cameras in one camera_list need not match.
        if self._ref_shape is None:
            shapes = [f.shape for f in frames if f is not None]
            self._ref_shape = tuple(shapes[0]) if shapes else (
                self.height, self.width, self.channels)
        elif self._warm_pin:
            # warmup's pin is provisional: the first real tick WITH frames
            # wins, so a wrong --warmup shape wastes the pre-compile instead
            # of silently changing numerics (host-resizing every stream).
            # An all-dropped tick (cameras still connecting) must NOT confirm
            # the pin — keep it provisional until a frame actually arrives.
            shapes = [f.shape for f in frames if f is not None]
            if shapes:
                if tuple(shapes[0]) != self._ref_shape:
                    print(f"warmup shape {self._ref_shape} != delivered frame "
                          f"{shapes[0]}: recompiling (pass --warmup HxW "
                          "matching the cameras)")
                    self._ref_shape = tuple(shapes[0])
                self._warm_pin = False
        ref_shape = self._ref_shape
        batch = np.zeros((self.n_streams, *ref_shape), np.uint8)
        for i, f in enumerate(frames):
            if f is not None:
                if f.shape != ref_shape:
                    f = self._host_resize(i, f, ref_shape)
                batch[i] = f

        # the tick donates the scorer maps/scalars (and the CL-ring store
        # donates the ring): defer signal delivery past each re-assignment
        with _defer_signals():
            (self.maps, self.scalars, norm_u8, rec_u8, score_count, x_dev) = self._step_j(
                self._serve_params, jnp.asarray(batch), self.maps, self.scalars,
                jnp.float32(self.stream_error_ma), jnp.asarray(valid),
            )

        if self.enable_cont_learning:
            self._ensure_cl()
            slot = self._cl_tick % self.cl_ring_ticks
            with _defer_signals():
                self._cl_ring = self._store_tick_j(
                    self._cl_ring, x_dev, jnp.int32(slot)
                )
            self._cl_valid[slot] = valid.astype(np.float32)
            self._cl_tick += 1
            if (now - self._last_cl_t) * 1000.0 > self.continuous_learning_period_ms:
                self._last_cl_t = now
                self._do_cl_step()
        self._maybe_autosave(now)

        if self.pipelined:
            # return tick N-1's results while tick N computes on device;
            # the raw batch (and tick tag) travels with its results so
            # recording/stats pair frame N-1's image with frame N-1's score
            pending = self._pending
            self._pending = (score_count, norm_u8, rec_u8, batch, valid, tag)
            if pending is None:
                return [None] * self.n_streams  # warmup tick
            score_count, norm_u8, rec_u8, batch, valid, tag = pending

        return self._emit(score_count, norm_u8, rec_u8, batch, valid, now, tag)

    def flush(self, now: Optional[float] = None) -> Optional[List[Optional[StreamStatus]]]:
        """Pipelined mode: fetch the last in-flight tick's results."""
        if not self.pipelined or self._pending is None:
            return None
        now = time.monotonic() if now is None else now
        score_count, norm_u8, rec_u8, batch, valid, tag = self._pending
        self._pending = None
        return self._emit(score_count, norm_u8, rec_u8, batch, valid, now, tag)

    def _emit(self, score_count, norm_u8, rec_u8, batch, valid, now, tag=None
              ) -> List[Optional[StreamStatus]]:
        """Host-side result processing for one tick: score fetch, EMA,
        per-stream state machines, recording."""
        self.last_emitted_tag = tag
        sc = np.asarray(score_count)

        out: List[Optional[StreamStatus]] = []
        for i in range(self.n_streams):
            if not valid[i]:
                out.append(None)
                continue
            score = float(sc[i, 0])
            ma = self.anomaly_ma_weight * self.score_ma[i] + (1 - self.anomaly_ma_weight) * score
            if not np.isnan(ma):
                self.score_ma[i] = ma
            self._record_score(i, score)
            self._update_state_machine(i, score, now)
            out.append(StreamStatus(
                score=score,
                score_ma=float(self.score_ma[i]),
                pixel_count=float(sc[i, 1]),
                anomalous=bool(self.anomalous[i]),
                _norm_dev=norm_u8[i],
                _rec_dev=rec_u8[i],
            ))
        self._maybe_record(batch, valid, out, now)
        return out

    def _record_score(self, i: int, score_f: float) -> None:
        """Append a score to stream i's CDF history, honoring
        ``cdf_warmup_skip`` exactly like StreamingEngine._record_score:
        the first K post-start/new_task scores (the EMA re-seeding storm,
        which rails at the z-cap) are kept out of the threshold statistics
        so the per-stream quantile reflects steady state."""
        self._task_scored[i] += 1
        if not np.isfinite(score_f):
            return
        skip = 0
        if self.anomaly_settings is not None:
            skip = int(self.anomaly_settings.get("cdf_warmup_skip", 0))
        if self._task_scored[i] <= skip:
            return
        self._score_history[i].append(score_f)
        self._cdf_dirty[i] += 1

    def current_threshold(self, i: int) -> Optional[float]:
        """Active threshold for stream i: fixed, or its per-stream CDF
        quantile once enough history exists. Same policy knobs as the
        single-stream engine (engine.current_threshold, where the defaults'
        A/B rationale lives): ``cdf_floor`` (default: the fixed threshold)
        floors the extrapolated quantile, ``cdf_warmup_abstain`` (default
        True) returns +inf until the per-task CDF is ready, ``cdf_window``
        (default 96) reads only the most recent scores. None when the
        engine was built without anomaly_settings (scoring runs, but no
        state machine is configured)."""
        if self.anomaly_settings is None:
            return None
        threshold = float(self.anomaly_settings.get("anomaly_score_threshold"))
        method = str(self.anomaly_settings.get("anomaly_score_method", "fixed"))
        if method.startswith("cdf"):
            if len(self._score_history[i]) < 32:
                if bool(self.anomaly_settings.get("cdf_warmup_abstain", True)):
                    return float("inf")
                return threshold
            if self._cdf[i] is None or self._cdf_dirty[i] >= 16:
                from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject

                window = int(self.anomaly_settings.get("cdf_window", 96))
                hist = np.asarray(self._score_history[i])
                self._cdf[i] = CDFObject(hist[-window:] if window > 0 else hist)
                self._cdf_dirty[i] = 0
            from trustedai_cl_vae_ad_tpu.anomaly.cdf import threshold_from_cdf

            q = float(self.anomaly_settings.get("cdf_quantile", 0.995))
            robust = bool(self.anomaly_settings.get("cdf_robust_tail", True))
            adaptive = threshold_from_cdf(self._cdf[i], q, robust=robust)
            floor = float(self.anomaly_settings.get("cdf_floor", threshold))
            return max(adaptive, floor)
        return threshold

    def _update_state_machine(self, i: int, score: float, now: float) -> None:
        """Per-stream threshold + hold period (reference :898-914)."""
        if self.anomaly_settings is None:
            self.anomalous[i] = False
            return
        threshold = self.current_threshold(i)
        if score > threshold:
            if not self.anomalous[i]:
                self.anomalous_start[i] = now
            self.anomalous[i] = True
        elif self.anomalous[i] and self.anomalous_start[i] is not None:
            hold = float(self.anomaly_settings.get("anomalous_state_period_s"))
            if now - self.anomalous_start[i] > hold:
                self.anomalous[i] = False

    def reset_stream(self, i: int) -> None:
        """Task/camera change on one stream: reset its EMA state only."""
        self.maps = self.maps.at[i].set(0.0)
        self.scalars = self.scalars.at[i].set(0.0)
        self.score_ma[i] = 0.0
        self.anomalous[i] = False
        self.anomalous_start[i] = None

    def new_task(self, i: Optional[int] = None,
                 reset_scorer: bool = False) -> None:
        """Task boundary for stream i (or ALL streams when None): reset the
        per-stream score CDF so its threshold re-derives, mirroring the
        single-stream engine's new_task. The scorer EMA state is KEPT by
        default (engine.new_task: re-seeding rails the score at the z-cap
        for dozens of frames — a measured false-alarm storm); pass
        ``reset_scorer=True`` for a hard reset (physical camera swap)."""
        streams = range(self.n_streams) if i is None else [i]
        for s in streams:
            self._score_history[s].clear()
            self._cdf[s] = None
            self._cdf_dirty[s] = 0
            self._task_scored[s] = 0
            if reset_scorer:
                self.reset_stream(s)
            else:
                # single-stream parity: the anomalous state machine is NOT
                # cleared — a mid-alarm stream keeps its hold period and
                # expires naturally (engine.new_task :467-484)
                self.score_ma[s] = 0.0
