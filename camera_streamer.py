#!/usr/bin/env python3
"""CLI: headless live-stream anomaly detection + continual learning.

The engine behind the reference's Qt camera app (camera_streamer_qt.py),
runnable without a display: capture (RTSP / webcam / video file / frame
directory / synthetic) -> TPU inference + streaming anomaly score ->
optional continual learning -> optional recording -> periodic autosave.

Usage:
  python camera_streamer.py cam_config.yml -m <model_logdir> [--cam-index 0]
  python camera_streamer.py --source synthetic -m <model_logdir> --max-frames 100
"""

import argparse
import json
import os
import time

# SIGTERM/SIGINT stop request, set by main()'s handler and consumed by the
# run loops at tick boundaries (never mid-dispatch — donation safety).
STOP_REQUESTED = {"n": 0}

# Exit code of a --max-rss-mb graceful restart (distinct from error exits so
# supervisors can treat it as "restart me", not "crashed").
RSS_EXIT_CODE = 3


def _rss_guard_tripped(args, n: int, engine) -> bool:
    """--max-rss-mb poll (every 25 ticks): on breach, synchronously save any
    dirty CL state to the model cache and report the trip — the caller then
    runs its normal graceful-shutdown path and exits RSS_EXIT_CODE. The
    leaked memory belongs to the tunnel client, not the engine (BENCH_NOTES
    r7), so a supervisor restart fully reclaims it while the model cache +
    --warmup + the persistent compile cache make the re-boot cheap."""
    if not args.max_rss_mb or n % 25 != 0:
        return False
    from trustedai_cl_vae_ad_tpu.utils.profiling import rss_mb

    rss = rss_mb()
    if rss <= args.max_rss_mb:
        return False
    print(f"host RSS {rss:.0f} MB exceeded --max-rss-mb {args.max_rss_mb:.0f}: "
          f"saving state and exiting {RSS_EXIT_CODE} for supervisor restart")
    # an in-flight --async-autosave round must land BEFORE the synchronous
    # save below: save_checkpoint's staging sweep assumes nothing is in
    # flight, and racing the background writers could tear the very round
    # this guard exists to preserve
    try:
        engine.drain_autosaves()
    except Exception as e:  # noqa: BLE001
        print(f"rss-guard autosave drain failed: {e}")
    if engine.model_cache_dir and getattr(engine, "model_changed_flag", False):
        try:
            engine.save_model_to_dir(engine.model_cache_dir)
        except Exception as e:  # noqa: BLE001 — still exit gracefully
            print(f"rss-guard save failed: {e}")
    return True


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("cam_config", type=str, nargs="?", default=None,
                        help="cam_config.yml with camera_list + anomaly_settings")
    parser.add_argument("--cam-config-index", type=int, default=0)
    parser.add_argument("--model-dir", "-m", type=str, default=None, help="Model log dir")
    parser.add_argument("--source", "-s", "--rtsp-override", "--rtsp-overide",
                        dest="source", type=str, default=None,
                        help="Override source: 'synthetic', dir, file, index, or URL "
                             "(--rtsp-override mirrors the reference CLI)")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--continual-learning", "-c", action="store_true")
    parser.add_argument("--learning-rate", type=float, default=None)
    parser.add_argument("--img-noise", type=float, default=None)
    parser.add_argument("--replay-buffer", type=str, default=None, help="txt/csv of image paths")
    parser.add_argument("--record-dir", "-r", type=str, default=None)
    parser.add_argument("--model-cache-dir", type=str, default="model_cache")
    parser.add_argument("--stats-jsonl", type=str, default=None, help="Write per-frame stats")
    parser.add_argument("--realtime", action="store_true",
                        help="Pace frames at source fps (default: as fast as possible)")
    parser.add_argument("--host-resize", action="store_true",
                        help="Shrink frames on host before upload (thin TPU links)")
    parser.add_argument("--pipelined", action="store_true",
                        help="One-frame-lag pipelining: overlap fetch with compute")
    parser.add_argument("--mesh", action="store_true",
                        help="With --all-cameras on a multi-chip host: shard "
                             "the K streams over all local devices (stream "
                             "count must divide the device count)")
    parser.add_argument("--metrics-dir", type=str, default=None,
                        help="Write CL-epoch losses + anomaly scores to "
                             "<dir>/metrics.jsonl (+TensorBoard). Defaults to "
                             "<model-cache-dir>/metrics when CL is enabled.")
    parser.add_argument("--all-cameras", action="store_true",
                        help="Batch ALL cam_config camera_list streams into one "
                             "TPU dispatch per tick (MultiCameraEngine); with "
                             "-c, fleet CL: one gradient step per period on "
                             "the union of all streams' recent frames")
    parser.add_argument("--n-streams", type=int, default=None,
                        help="With --all-cameras --source synthetic: stream count")
    parser.add_argument("--combine-datasets", nargs="+", metavar="SRC",
                        help="Merge recorded dataset dirs (labels.json images "
                             "concatenated) into --combine-dest and exit "
                             "(reference GUI combine action)")
    parser.add_argument("--combine-dest", type=str, default=None)
    parser.add_argument("--quantize", action="store_true",
                        help="int8-quantize the big dense kernels for the "
                             "inference dispatch (ops/quant.py); CL keeps "
                             "float params and re-quantizes after each step")
    parser.add_argument("--autosave-period-s", type=float, default=5 * 60.0,
                        help="Seconds between scheduled model-cache saves "
                             "(reference hardcodes 5 min, :251-253)")
    parser.add_argument("--async-autosave", action="store_true",
                        help="Background the periodic model-cache writes: the "
                             "frame loop resumes after the device->host copy "
                             "instead of stalling for the full disk write "
                             "(~8 GB at flagship scale with CL on)")
    parser.add_argument("--warmup", nargs="?", const="native", default=None,
                        metavar="HxW",
                        help="Pre-compile the dispatch (and the CL step with "
                             "-c) BEFORE attaching cameras — the first jit "
                             "costs minutes on remote-compile runtimes. Pass "
                             "the camera resolution (e.g. 1080x1920) or omit "
                             "the value for the model's native size (exact "
                             "with --host-resize)")
    parser.add_argument("--max-rss-mb", type=float, default=None,
                        help="Operational guard for multi-day runs: when host "
                             "RSS exceeds this many MB, save CL state to the "
                             "model cache, drain, and exit with code "
                             f"{RSS_EXIT_CODE} so a supervisor restarts the "
                             "process (tunneled TPU clients leak host RSS at "
                             "the frame-upload rate — SERVING.md 'Host "
                             "memory'; state survives via the cache + "
                             "--warmup + the persistent compile cache)")
    args = parser.parse_args()
    args.warmup = parse_warmup_spec(args.warmup, parser.error)
    if args.combine_datasets and not args.combine_dest:
        parser.error("--combine-datasets requires --combine-dest")
    if not args.combine_datasets and not args.model_dir:
        parser.error("--model-dir/-m is required (except with --combine-datasets)")
    return args


def parse_warmup_spec(value, error):
    """--warmup value -> (H, W) | "native" | None. ``error`` is the
    argparse usage-error callback (shared with camera_streamer_qt.py)."""
    if value and value != "native":
        try:
            h, w = (int(x) for x in value.lower().split("x"))
            return (h, w)
        except ValueError:
            error(f"--warmup expects HxW (got {value!r})")
    return value


def warmup_engine(engine, spec, cl=False, host_resize=False, label="frame"):
    """Resolve a --warmup spec and pre-compile the engine's dispatch.

    With --host-resize every frame is resized to the model's native size on
    the host BEFORE dispatch, so native is the exact shape to warm — an HxW
    spec would compile a shape the dispatch never sees (wasting the warmup
    and leaving frame 0 to pay the jit anyway)."""
    if host_resize and spec != "native":
        print(f"--host-resize delivers native frames to the dispatch: "
              f"warming native, ignoring --warmup {spec[0]}x{spec[1]}")
        spec = "native"
    shape = None if spec == "native" else (*spec, engine.channels)
    print(f"warming up (pre-compiling the {label} dispatch"
          + (" + CL step)" if cl else ")"))
    engine.warmup(frame_shape=shape, cl=cl)


class _LiveDrainThread:
    """Continuously reads a live source on a daemon thread, keeping only the
    newest frame. cv2 capture FIFOs back up when read slower than the camera
    delivers (staleness grows without bound), and a blocking cap.read() in
    the tick loop would throttle the whole fleet to the slowest camera —
    the reader thread absorbs both (cv2.read releases the GIL while it
    waits). This is the multicam analogue of the reference's grab-timer
    running at each camera's own rate (camera_streamer_qt.py:235-237)."""

    def __init__(self, source):
        import threading

        self.source = source
        self._lock = threading.Lock()
        self._latest = None
        self._stop = False
        self.dead = False  # set when the source exhausts or the read raises
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        try:
            while not self._stop and not self.source.exhausted:
                f = self.source.read()  # blocks until the camera's next frame
                if f is not None:
                    with self._lock:
                        self._latest = f
        except Exception as e:
            # surface the failure: a silently-dead drain thread would let
            # read() hand out the same frozen frame forever
            print(f"camera drain thread died: {e}")
        finally:
            self.dead = True

    def read(self):
        if self.dead:
            return None  # exhausted/failed source terminates the stream
        with self._lock:
            return self._latest  # newest frame, never blocks the tick

    def stop(self) -> bool:
        """Signal the loop and join (bounded). Returns whether the thread
        actually exited — the caller must NOT release the underlying capture
        while a cv2.read may still be in flight on this thread."""
        self._stop = True
        self._thread.join(timeout=2.0)
        return not self._thread.is_alive()


class PacedReader:
    """Reads a source at its own fps relative to the batched tick rate.

    The multicam tick runs at the fastest camera's fps; a slower REPLAYABLE
    source (file/directory/synthetic) is only read() on the ticks where a
    new frame is due (fractional-accumulator schedule, deterministic) and
    repeats its latest frame in between — so mixed-fps camera lists don't
    drain slower file/directory sources early. LIVE sources (webcam/RTSP,
    ``source.is_live``) are read on a dedicated drain thread instead
    (_LiveDrainThread) so the tick always gets the newest frame without
    blocking on any camera's delivery rate.
    """

    def __init__(self, source, fps: float, tick_fps: float):
        self.source = source
        self._ratio = min(max(fps, 1e-6) / max(tick_fps, 1e-6), 1.0)
        self._acc = 0.0
        self._last = None
        self._drain = (_LiveDrainThread(source)
                       if getattr(source, "is_live", False) else None)

    def read(self):
        if self._drain is not None:
            f = self._drain.read()
            if f is not None:
                self._last = f
            elif self._drain.dead or self.source.exhausted:
                # drain thread exited (exhausted source OR a read error):
                # report the stream as ended instead of repeating the last
                # frame forever
                return None
            return self._last
        if self.source.exhausted:
            return None
        self._acc += self._ratio
        if self._last is None or self._acc >= 1.0:
            if self._acc >= 1.0:
                self._acc -= 1.0
            f = self.source.read()
            if f is not None:
                self._last = f
            elif self.source.exhausted:
                return None
        return self._last

    def release(self):
        if self._drain is not None and not self._drain.stop():
            # the drain thread is still blocked inside cv2.read (stalled
            # RTSP): releasing the capture under it is a use-after-release
            # inside OpenCV — leak the capture instead (the daemon thread
            # dies with the process)
            print("drain thread still in a blocking read; leaking capture")
            return
        self.source.release()


def run_all_cameras(args):
    """Batched multi-stream scoring: one device dispatch covers every camera
    in camera_list per tick (stream/multicam.py)."""
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory
    from trustedai_cl_vae_ad_tpu.stream.capture import make_source
    from trustedai_cl_vae_ad_tpu.stream.engine import load_cam_config
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    anomaly_settings = None
    if args.cam_config:
        cam_config = load_cam_config(args.cam_config)
        anomaly_settings = cam_config.get("anomaly_settings")
        specs = [c.get("url") for c in cam_config["camera_list"]]
        names = [c.get("name", f"cam{i}") for i, c in enumerate(cam_config["camera_list"])]
        fps_list = [float(c.get("fps", 20)) for c in cam_config["camera_list"]]
    else:
        n = args.n_streams or 2
        specs = ["synthetic"] * n
        names = [f"synthetic{i}" for i in range(n)]
        fps_list = [20.0] * n
    fps = max(fps_list)

    metrics_dir = args.metrics_dir
    if metrics_dir is None and args.continual_learning:
        metrics_dir = os.path.join(args.model_cache_dir, "metrics")
    metrics = None
    if metrics_dir:
        from trustedai_cl_vae_ad_tpu.utils.metrics import MetricsWriter

        os.makedirs(metrics_dir, exist_ok=True)
        metrics = MetricsWriter(metrics_dir)

    qparams = None
    if args.quantize and not args.continual_learning:
        # int8-checkpoint boot (tools/quantize_checkpoint.py): an
        # inference-only fleet never materializes the float params — half
        # the upload, no on-device quantization pass (BENCH_NOTES r5)
        from trustedai_cl_vae_ad_tpu.ops.quant import (
            has_quantized_checkpoint,
            load_int8_serving_model,
        )

        if has_quantized_checkpoint(args.model_dir):
            model, config = load_int8_serving_model(args.model_dir)
            qparams = model.qparams
    if qparams is None:
        # CL resume: restore checkpointed Adam moments in the same read that
        # restores params (engine.load_engine_from_directory does the same; an
        # unconditional compile() later would re-init and wipe them)
        model, config = load_model_from_directory(
            args.model_dir, restore_optimizer=True if args.continual_learning else None)
    mesh = None
    if args.mesh:
        from trustedai_cl_vae_ad_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    engine = MultiCameraEngine(model, config, n_streams=len(specs),
                               anomaly_settings=anomaly_settings,
                               quantize=args.quantize, metrics=metrics,
                               model_cache_dir=args.model_cache_dir,
                               autosave_period_s=args.autosave_period_s,
                               pipelined=args.pipelined, mesh=mesh,
                               qparams=qparams,
                               async_autosave=args.async_autosave)
    engine.enable_cont_learning = args.continual_learning
    if args.learning_rate is not None:
        if args.continual_learning:
            engine.set_learning_rate(args.learning_rate)
        else:
            # set_learning_rate would compile the optimizer — multi-GB Adam
            # moments an inference-only fleet never uses
            print("--learning-rate ignored without --continual-learning")
    if args.img_noise is not None:
        engine.set_img_noise(args.img_noise)
    replay_src = args.replay_buffer
    if replay_src is None:
        # fleet snapshots embed their replay provenance — restore it like
        # the single-stream loader does
        candidate = os.path.join(args.model_dir, "replay_buffer_paths.csv")
        replay_src = candidate if os.path.exists(candidate) else None
    if replay_src:
        engine.load_replay_buffer_from_file(replay_src)
    if args.record_dir:
        os.makedirs(args.record_dir, exist_ok=True)
        engine.begin_recording(args.record_dir, names=names)
    if args.warmup:
        warmup_engine(engine, args.warmup, cl=args.continual_learning,
                      label="tick")
    # the batched tick runs at the fastest camera's rate; each source is
    # paced at ITS fps by PacedReader (repeats its latest frame between dues)
    sources = [PacedReader(make_source(s, fps=f), f, fps)
               for s, f in zip(specs, fps_list)]
    stats_file = open(args.stats_jsonl, "w") if args.stats_jsonl else None
    n = 0
    rss_tripped = False
    try:
        while args.max_frames is None or n < args.max_frames:
            if STOP_REQUESTED["n"]:  # deferred SIGTERM/SIGINT (see main)
                raise KeyboardInterrupt
            if _rss_guard_tripped(args, n, engine):
                rss_tripped = True
                raise KeyboardInterrupt  # reuse the graceful-shutdown path
            t0 = time.perf_counter()
            frames = []
            alive = False
            for src in sources:
                f = src.read()
                frames.append(f)
                alive = alive or f is not None
            if not alive:
                break
            results = engine.process_frames(frames, tag=n)
            lat_ms = (time.perf_counter() - t0) * 1000.0
            # pipelined mode emits tick N-1's results at tick N: the engine
            # reports which tick the returned SCORES belong to
            scored_tick = engine.last_emitted_tag
            if n % 20 == 0:
                line = " | ".join(
                    f"{names[i]}: AS={r.score: .3f}{' **' if r.anomalous else ''}"
                    for i, r in enumerate(results) if r is not None
                )
                print(f"tick {n} ({lat_ms:.1f} ms): {line}")
            if stats_file and scored_tick is not None:
                stats_file.write(json.dumps({
                    "tick": scored_tick, "latency_ms": round(lat_ms, 3),
                    "scores": [None if r is None else r.score for r in results],
                    "anomalous": [None if r is None else r.anomalous for r in results],
                }) + "\n")
            n += 1
            if args.realtime:
                time.sleep(max(0.0, 1.0 / fps - (time.perf_counter() - t0)))
    except KeyboardInterrupt:
        print("Keyboard Interrupt")
    finally:
        for src in sources:
            src.release()
        try:  # best-effort: a device error here must not skip cleanup below
            last = engine.flush() if engine.pipelined else None
            if last is not None and stats_file:
                stats_file.write(json.dumps({
                    "tick": engine.last_emitted_tag, "flushed": True,
                    "scores": [None if r is None else r.score for r in last],
                }) + "\n")
        except Exception as e:
            print(f"flush failed: {e}")
        if engine.recording_flag:
            engine.terminate_recording()
        # an in-flight background autosave cut off by interpreter teardown
        # is a lost save — drain it (no-op without --async-autosave); a
        # failed background write surfaces here without skipping cleanup
        try:
            engine.drain_autosaves()
        except Exception as e:
            print(f"autosave drain failed: {e}")
        if stats_file:
            stats_file.close()
        if metrics is not None:
            metrics.close()
    print(f"processed {n} ticks x {len(specs)} streams")
    return rss_tripped


def main():
    args = get_args()

    # SIGTERM (supervisor/container stop) kills Python without running the
    # run loops' finally blocks — losing terminate_recording's labels.json +
    # model snapshot and any CL weights trained since the last autosave.
    # The handler only RECORDS the stop; the run loops raise
    # KeyboardInterrupt at the next tick boundary. Raising directly (and
    # stock Ctrl-C delivery, so SIGINT is converted too) can land inside a
    # donating dispatch — the frame step donates the ring/scorer state and
    # the CL step donates (params, opt_state); an exception there leaves
    # deleted device buffers and the shutdown save itself then crashes
    # ("Array has been deleted"). A second signal escalates to an immediate
    # raise (the tick in flight is lost, deliberately).
    import signal

    def _request_stop(_sig, _frm):
        STOP_REQUESTED["n"] += 1
        if STOP_REQUESTED["n"] >= 2:
            raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    from trustedai_cl_vae_ad_tpu.stream.capture import make_source
    from trustedai_cl_vae_ad_tpu.stream.engine import (
        combine_datasets,
        load_cam_config,
        load_engine_from_directory,
    )

    if args.combine_datasets:
        os.makedirs(args.combine_dest, exist_ok=True)
        out = combine_datasets(args.combine_datasets, args.combine_dest)
        print(f"Combined {len(args.combine_datasets)} datasets -> {out}")
        return

    if args.all_cameras:
        if run_all_cameras(args):
            raise SystemExit(RSS_EXIT_CODE)
        return

    anomaly_settings = None
    cam_info = None
    source_spec = args.source
    fps = 20.0
    if args.cam_config:
        cam_config = load_cam_config(args.cam_config, args.cam_config_index)
        anomaly_settings = cam_config.get("anomaly_settings")
        cam_info = cam_config["camera_list"][args.cam_config_index]
        fps = float(cam_info.get("fps", 20))
        if source_spec is None:
            source_spec = cam_info.get("url")
    if source_spec is None:
        source_spec = "synthetic"

    metrics = None
    metrics_dir = args.metrics_dir
    if metrics_dir is None and args.continual_learning:
        metrics_dir = os.path.join(args.model_cache_dir, "metrics")
    if metrics_dir:
        from trustedai_cl_vae_ad_tpu.utils.metrics import MetricsWriter

        metrics = MetricsWriter(metrics_dir)

    engine = load_engine_from_directory(
        args.model_dir,
        anomaly_settings=anomaly_settings,
        model_cache_dir=args.model_cache_dir,
        autosave_period_s=args.autosave_period_s,
        host_resize=args.host_resize,
        async_autosave=args.async_autosave,
        pipelined=args.pipelined,
        metrics=metrics,
        quantize=args.quantize,
        # inference-only + --quantize: boot straight from <logdir>/quantized
        # when present (half the upload; CL needs the float tree)
        int8_checkpoint_boot=not args.continual_learning,
    )
    if cam_info:
        engine.cam_info = cam_info
    engine.enable_cont_learning = args.continual_learning
    if args.learning_rate is not None:
        if args.continual_learning:
            engine.set_learning_rate(args.learning_rate)
        else:
            # set_learning_rate would compile the optimizer — multi-GB Adam
            # moments an inference-only fleet never uses
            print("--learning-rate ignored without --continual-learning")
    if args.img_noise is not None:
        engine.set_img_noise(args.img_noise)
    if args.replay_buffer:
        engine.load_replay_buffer_from_file(args.replay_buffer)
    if args.record_dir:
        os.makedirs(args.record_dir, exist_ok=True)
        engine.begin_recording(args.record_dir)

    if not args.realtime:
        # offline replay: process every frame, ignore the wall-clock hold-off
        engine.inference_period_ms = 0.0

    if args.warmup:
        warmup_engine(engine, args.warmup, cl=args.continual_learning,
                      host_resize=args.host_resize)
    source = make_source(source_spec, fps=fps)
    stats_file = open(args.stats_jsonl, "w") if args.stats_jsonl else None

    n = 0
    latencies = []
    rss_tripped = False
    try:
        for frame in source:
            if STOP_REQUESTED["n"]:  # deferred SIGTERM/SIGINT (see main)
                raise KeyboardInterrupt
            if _rss_guard_tripped(args, n, engine):
                rss_tripped = True
                raise KeyboardInterrupt  # reuse the graceful-shutdown path
            t0 = time.perf_counter()
            result = engine.process_frame(frame, tag=n)
            if result is not None:
                lat_ms = (time.perf_counter() - t0) * 1000.0
                latencies.append(lat_ms)
                # pipelined mode emits an EARLIER submission's result (and
                # --realtime hold-off can skip frames entirely): the result
                # carries the tag of the frame its score belongs to
                line = {
                    "frame": result.tag,
                    "score": result.score,
                    "score_ma": result.score_ma,
                    "count": result.pixel_count,
                    "anomalous": result.anomalous,
                    "latency_ms": round(lat_ms, 3),
                    "cl_stepped": result.cl_stepped,
                }
                if stats_file:
                    stats_file.write(json.dumps(line) + "\n")
                if n % 20 == 0 or result.anomalous:
                    print(f"frame {line['frame']}: AS={result.score: .4f} MA={result.score_ma: .4f} "
                          f"{'**ANOMALOUS**' if result.anomalous else ''} ({lat_ms:.2f} ms)")
            n += 1
            if args.max_frames is not None and n >= args.max_frames:
                break
            if args.realtime:
                time.sleep(max(0.0, 1.0 / fps - (time.perf_counter() - t0)))
    except KeyboardInterrupt:
        print("Keyboard Interrupt")
    finally:
        source.release()
        try:  # best-effort: a device error here must not skip cleanup below
            last = engine.flush() if engine.pipelined else None
            if last is not None and stats_file:
                stats_file.write(json.dumps({"frame": last.tag, "score": last.score,
                                             "score_ma": last.score_ma, "flushed": True}) + "\n")
        except Exception as e:
            print(f"flush failed: {e}")
        if engine.recording_flag:
            engine.terminate_recording()
        # an in-flight background autosave cut off by interpreter teardown
        # is a lost save — drain it (no-op without --async-autosave); a
        # failed background write surfaces here without skipping cleanup
        try:
            engine.drain_autosaves()
        except Exception as e:
            print(f"autosave drain failed: {e}")
        if stats_file:
            stats_file.close()
        if metrics is not None:
            metrics.close()

    if latencies:
        import numpy as np

        lat = np.array(latencies[2:] if len(latencies) > 4 else latencies)
        print(f"processed {n} frames; latency p50={np.percentile(lat, 50):.2f} ms "
              f"p95={np.percentile(lat, 95):.2f} ms mean={lat.mean():.2f} ms")
    if rss_tripped:
        raise SystemExit(RSS_EXIT_CODE)


if __name__ == "__main__":
    main()
