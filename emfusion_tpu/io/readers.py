"""RGB-D dataset readers with background prefetching.

Equivalent of the reference reader stack (``src/utils/RGBDReader.cpp``,
``TUMRGBDReader.cpp``, ``ImageReader.cpp``): a producer thread keeps a
bounded frame queue (~1 s of frames) ahead of the consumer so disk I/O and
PNG/EXR decoding stay off the per-frame critical path.

  * :class:`TUMReader` parses ``associations.txt`` and scales 16-bit depth
    by 1/5000 (``TUMRGBDReader.cpp:95-104``), deriving the frame rate from
    timestamps (``:91-92``).
  * :class:`CoFusionReader` reads ``Color%04d.png`` / ``Depth%04d.exr``
    with the >100 m clamp and non-zero start-index scan
    (``ImageReader.cpp:41-117``).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

try:
    import cv2
    cv2.setNumThreads(2)
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

try:
    from emfusion_tpu import native as _native
    _HAS_NATIVE = _native.available()
except Exception:  # pragma: no cover
    _HAS_NATIVE = False


def _imread_rgb(path: str) -> Optional[np.ndarray]:
    """RGB decode: native libpng fast path, cv2 fallback."""
    if _HAS_NATIVE and path.endswith(".png"):
        img = _native.read_png_rgb(path)
        if img is not None:
            return img
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return None


def _imread_depth16(path: str) -> Optional[np.ndarray]:
    """16-bit depth PNG decode (TUM)."""
    if _HAS_NATIVE and path.endswith(".png"):
        img = _native.read_png_gray16(path)
        if img is not None:
            return img
    if _HAS_CV2:
        return cv2.imread(path, cv2.IMREAD_UNCHANGED)
    return None


def _imread_exr(path: str) -> Optional[np.ndarray]:
    """EXR depth decode (Co-Fusion). cv2 in this image has no EXR support,
    so the native decoder is the primary path."""
    if _HAS_NATIVE:
        img = _native.read_exr(path)
        if img is not None:
            return img
    if _HAS_CV2:
        return cv2.imread(path, cv2.IMREAD_UNCHANGED)
    return None


@dataclasses.dataclass
class RGBDFrame:
    rgb: Optional[np.ndarray]      # (H, W, 3) uint8 or None
    depth: np.ndarray              # (H, W) float32, meters, 0 = invalid
    index: int = 0
    timestamp: Optional[float] = None


class _BufferedReader:
    """Producer-thread frame buffer (``RGBDReader::readerLoop``)."""

    def __init__(self):
        self._queue: "queue.Queue[RGBDFrame]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self.num_frames = 0
        self.frame_rate = 30.0
        self.min_buffer = 30

    # subclasses implement
    def _read_frame(self, index: int) -> RGBDFrame:
        raise NotImplementedError

    def init(self) -> None:
        raise NotImplementedError

    def _start_native(self, rgb_paths, depth_paths, depth_scale=1.0,
                      depth_clamp=1e30, timestamps=None, start_index=0):
        """Multi-worker C++ decode pipeline (preferred when built)."""
        self._pf = _native.NativePrefetcher(
            rgb_paths, depth_paths, n_workers=4,
            capacity=max(self.min_buffer, 4), depth_scale=depth_scale,
            depth_clamp=depth_clamp)
        self._pf_timestamps = timestamps
        self._pf_offset = start_index
        self._consumed = start_index

    def _start(self, start_index: int = 0):
        self._next = start_index
        self._stop = False
        self._pf = None

        def loop():
            while not self._stop and self._next < self.num_frames:
                if self._queue.qsize() >= self.min_buffer:
                    threading.Event().wait(0.005)
                    continue
                self._queue.put(self._read_frame(self._next))
                self._next += 1

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        self._consumed = 0

    def peek(self):
        """Read frame 0 without consuming the stream (frame-size /
        format probing). Uses the direct per-frame reader, not the
        prefetch queue."""
        try:
            return self._read_frame(0)
        except Exception:
            return None

    def more_frames(self) -> bool:
        return self._consumed < self.num_frames

    def get_next_frame(self) -> RGBDFrame:
        if getattr(self, "_pf", None) is not None:
            rgb, depth, i = self._pf.next()
            idx = i + self._pf_offset
            ts = (self._pf_timestamps[i]
                  if self._pf_timestamps is not None else None)
            self._consumed += 1
            return RGBDFrame(rgb=rgb, depth=depth, index=idx, timestamp=ts)
        frame = self._queue.get()
        self._consumed += 1
        return frame

    def frames(self) -> Iterator[RGBDFrame]:
        while self.more_frames():
            yield self.get_next_frame()

    def close(self):
        if getattr(self, "_pf", None) is not None:
            self._pf.close()
            self._pf = None
            return
        self._stop = True
        if self._thread is not None:
            # drain so the producer can exit
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=2.0)


class TUMReader(_BufferedReader):
    """TUM RGB-D benchmark sequences via ``associations.txt``."""

    DEPTH_SCALE = 1.0 / 5000.0

    def __init__(self, path: str):
        super().__init__()
        self.path = path.rstrip("/") + "/"
        self.pairs = []       # (timestamp, rgb_file, depth_file)

    def init(self):
        assoc = os.path.join(self.path, "associations.txt")
        with open(assoc) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                ts = float(parts[0])
                if parts[1].startswith("rgb/"):
                    self.pairs.append((ts, parts[1], parts[3]))
                else:
                    self.pairs.append((ts, parts[3], parts[1]))
        self.num_frames = len(self.pairs)
        if self.num_frames > 1:
            span = self.pairs[-1][0] - self.pairs[0][0]
            if span > 0:
                self.frame_rate = self.num_frames / span
        self.min_buffer = max(int(round(self.frame_rate)), 1)
        if _HAS_NATIVE:
            try:
                self._start_native(
                    [os.path.join(self.path, p[1]) for p in self.pairs],
                    [os.path.join(self.path, p[2]) for p in self.pairs],
                    depth_scale=self.DEPTH_SCALE,
                    timestamps=[p[0] for p in self.pairs])
                return
            except RuntimeError:
                pass
        self._start()

    def _read_frame(self, index):
        ts, rgb_f, depth_f = self.pairs[index]
        rgb = _imread_rgb(os.path.join(self.path, rgb_f))
        depth_raw = _imread_depth16(os.path.join(self.path, depth_f))
        depth = depth_raw.astype(np.float32) * self.DEPTH_SCALE
        return RGBDFrame(rgb=rgb, depth=depth, index=index, timestamp=ts)


class CoFusionReader(_BufferedReader):
    """Co-Fusion sequences: ``colour_dir/Color%04d.png`` +
    ``depth_*/Depth%04d.exr``."""

    def __init__(self, path: str, colordir: str = "colour",
                 depthdir: str = "depth_noise"):
        super().__init__()
        self.colorpath = os.path.join(path, colordir)
        self.depthpath = os.path.join(path, depthdir)
        self.start_index = 0

    def init(self):
        rgbs = len([f for f in os.listdir(self.colorpath)
                    if f.endswith(".png")])
        depths = len([f for f in os.listdir(self.depthpath)
                      if f.endswith(".exr")])
        if rgbs != depths:
            raise RuntimeError("Different number of rgb and depth files!")
        # find the starting index (ImageReader.cpp:66-95)
        idx = 0
        while not (os.path.exists(self._rgb_path(idx))
                   and os.path.exists(self._depth_path(idx))):
            idx += 1
            if idx >= rgbs + 1000:
                raise RuntimeError("Could not find starting index!")
        self.start_index = idx
        self.num_frames = idx + rgbs
        self._consumed_offset = idx
        self.min_buffer = int(self.frame_rate)
        if _HAS_NATIVE:
            try:
                rng = range(idx, self.num_frames)
                self._start_native(
                    [self._rgb_path(i) for i in rng],
                    [self._depth_path(i) for i in rng],
                    depth_clamp=100.0,  # ImageReader.cpp:116
                    start_index=idx)
                return
            except RuntimeError:
                pass
        self._start(start_index=idx)
        self._consumed = idx

    def _rgb_path(self, i):
        return os.path.join(self.colorpath, f"Color{i:04d}.png")

    def _depth_path(self, i):
        return os.path.join(self.depthpath, f"Depth{i:04d}.exr")

    def _read_frame(self, index):
        rgb = _imread_rgb(self._rgb_path(index))
        depth = _imread_exr(self._depth_path(index))
        if depth is None:
            raise RuntimeError(f"missing depth {index}")
        if depth.ndim == 3:
            depth = depth[..., 0]
        depth = depth.astype(np.float32)
        depth[depth > 100.0] = 0.0     # ImageReader.cpp:116
        return RGBDFrame(rgb=rgb, depth=depth, index=index)


def make_reader(path: str, kind: Optional[str] = None,
                colordir: str = "colour", depthdir: str = "depth_noise"):
    """Auto-detect dataset type like the reference app flags (-t vs -d)."""
    if kind == "tum" or (kind is None and os.path.exists(
            os.path.join(path, "associations.txt"))):
        return TUMReader(path)
    return CoFusionReader(path, colordir, depthdir)
