"""Frame sources: RTSP/webcam/video-file via OpenCV, directories, synthetic.

Capability parity with reference camera_streamer_qt.py:288-344: camera URL
resolution (None -> webcam 0, digit string -> device index, else RTSP/file
URL), MJPG fourcc request, and exponential-backoff reconnect on read failure
(negotiate_rtsp_connection :336-343, re-entered from the grab loop
:1156-1161). A synthetic source provides deterministic frames (with optional
injected anomalies) for tests and headless demos.
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import numpy as np


class FrameSource:
    """Iterator protocol: yields RGB uint8 HWC frames.

    read() returns None for a TRANSIENT gap (corrupt frame, RTSP hiccup);
    sources set ``exhausted`` when the stream has truly ended. Iteration
    skips transient gaps (up to MAX_CONSECUTIVE_GAPS, so a permanently dead
    live source still terminates) and stops only on exhaustion."""

    fps: float = 20.0
    exhausted: bool = False
    # live sources (webcam/RTSP) buffer internally and must be DRAINED every
    # tick — skipping read()s backs up their FIFO and serves stale frames;
    # replayable sources (file/dir/synthetic) are consumed only when due
    is_live: bool = False
    MAX_CONSECUTIVE_GAPS = 10

    def read(self) -> Optional[np.ndarray]:
        raise NotImplementedError

    def release(self) -> None:
        pass

    def __iter__(self) -> Iterator[np.ndarray]:
        gaps = 0
        while True:
            frame = self.read()
            if frame is None:
                if self.exhausted:
                    return
                gaps += 1
                if gaps >= self.MAX_CONSECUTIVE_GAPS:
                    return  # persistently dead source
                continue
            gaps = 0
            yield frame


class SyntheticSource(FrameSource):
    """Moving-gradient frames; frames in ``anomaly_frames`` get a bright blob.

    Deterministic, so streaming-score tests can assert anomaly detection.
    """

    def __init__(
        self,
        width: int = 320,
        height: int = 240,
        fps: float = 30.0,
        n_frames: int = 300,
        anomaly_frames: Optional[range] = None,
        seed: int = 0,
        motion: float = 1.0,
    ):
        self.width, self.height, self.fps = width, height, fps
        self.n_frames = n_frames
        self.anomaly_frames = anomaly_frames or range(0)
        self.motion = motion
        self._rng = np.random.RandomState(seed)
        self._i = 0
        yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
        self._yy, self._xx = yy / height, xx / width

    def read(self) -> Optional[np.ndarray]:
        if self._i >= self.n_frames:
            self.exhausted = True
            return None
        t = self.motion * self._i / max(self.fps, 1.0)
        r = 0.5 + 0.4 * np.sin(2 * np.pi * (self._xx + 0.1 * t))
        g = 0.5 + 0.4 * np.cos(2 * np.pi * (self._yy - 0.07 * t))
        b = 0.5 + 0.4 * np.sin(2 * np.pi * (self._xx + self._yy + 0.05 * t))
        frame = np.stack([r, g, b], axis=-1)
        frame += self._rng.normal(0, 0.01, frame.shape)
        if self._i in self.anomaly_frames:
            cy, cx = self.height // 2, self.width // 2
            rr = max(min(self.height, self.width) // 10, 2)
            mask = (self._yy * self.height - cy) ** 2 + (self._xx * self.width - cx) ** 2 < rr**2
            frame[mask] = 1.0
        self._i += 1
        return np.clip(np.round(frame * 255), 0, 255).astype(np.uint8)


class DirectorySource(FrameSource):
    """Replays PNG/JPG frames from a directory in sorted order."""

    def __init__(self, path: str, fps: float = 20.0, loop: bool = False):
        self.fps = fps
        self.loop = loop
        exts = (".png", ".jpg", ".jpeg", ".bmp")
        self.files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if os.path.splitext(f)[1].lower() in exts
        )
        assert self.files, f"no frames in {path}"
        self._i = 0

    def read(self) -> Optional[np.ndarray]:
        if self._i >= len(self.files):
            if not self.loop:
                self.exhausted = True
                return None
            self._i = 0
        from trustedai_cl_vae_ad_tpu.data.pipeline import decode_image_rgb

        img = decode_image_rgb(self.files[self._i])
        self._i += 1
        return img


class OpenCVSource(FrameSource):
    """cv2.VideoCapture over webcam index / video file / RTSP URL.

    URL resolution + reconnect parity with camera_streamer_qt.py:299-344.
    """

    def __init__(self, url, fps: float = 20.0, max_backoff_s: float = 8.0):
        import cv2

        self._cv2 = cv2
        # camera_streamer_qt.py:299-304: empty -> webcam 0, digits -> index
        if url is None or url == "":
            url = 0
        elif isinstance(url, str) and url.isdigit():
            url = int(url)
        self.url = url
        self.fps = fps
        self.max_backoff_s = max_backoff_s
        # a local FILE that stops returning frames has ENDED — reconnecting
        # would replay it forever; only live sources (RTSP/webcam) reconnect
        self._is_file = isinstance(url, str) and os.path.isfile(url)
        self.is_live = not self._is_file
        self.cap = None
        self._connect()

    def _connect(self) -> None:
        cv2 = self._cv2
        self.cap = cv2.VideoCapture(self.url)
        try:
            self.cap.set(cv2.CAP_PROP_FOURCC, cv2.VideoWriter_fourcc(*"MJPG"))
        except Exception:
            pass

    def negotiate_connection(self) -> bool:
        """Exponential-backoff reconnect (reference :336-343)."""
        backoff = 0.5
        while backoff <= self.max_backoff_s:
            if self.cap is not None:
                self.cap.release()
            time.sleep(backoff)
            self._connect()
            if self.cap.isOpened():
                ok, _ = self.cap.read()
                if ok:
                    return True
            backoff *= 2.0
        return False

    def read(self) -> Optional[np.ndarray]:
        cv2 = self._cv2
        if self.cap is None or not self.cap.isOpened():
            if not self.negotiate_connection():
                return None
        ok, frame = self.cap.read()
        if not ok:
            if self._is_file:
                self.exhausted = True
                return None  # end of file
            ts = time.strftime("%Y%m%d-%H%M%S")
            print(f"{ts}: Failed to read capture device: {self.url}")
            if not self.negotiate_connection():
                return None
            ok, frame = self.cap.read()
            if not ok:
                return None
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def release(self) -> None:
        if self.cap is not None:
            self.cap.release()
            self.cap = None


def make_source(spec, fps: float = 20.0) -> FrameSource:
    """Build a source from a spec string: 'synthetic', a directory, a file,
    a digit webcam index, or an rtsp/http URL."""
    if spec == "synthetic":
        return SyntheticSource(fps=fps)
    if isinstance(spec, str) and os.path.isdir(spec):
        return DirectorySource(spec, fps=fps)
    return OpenCVSource(spec, fps=fps)
