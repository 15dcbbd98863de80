"""ctypes bindings for the native runtime (libemf_runtime.so).

The native tier covers what the reference implements in C++ outside the
GPU kernels: image decode (OpenCV imread in ``src/utils/*Reader.cpp``),
the background reader thread (``src/utils/RGBDReader.cpp:72-117``) and the
result writers (``src/core/EMFusion.cpp:991-1313``). The library is built
on first use (``make`` in this directory); every entry point has a pure-
Python fallback in ``io/readers.py`` / ``io/writers.py``, so the package
works without a compiler too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libemf_runtime.so")
_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-s"], cwd=_DIR, check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _bind(lib):
    c = ctypes
    u8p = c.POINTER(c.c_uint8)
    u16p = c.POINTER(c.c_uint16)
    f32p = c.POINTER(c.c_float)
    i32p = c.POINTER(c.c_int32)

    lib.emf_exr_read.restype = f32p
    lib.emf_exr_read.argtypes = [c.c_char_p, i32p, i32p, i32p]
    lib.emf_exr_write.restype = c.c_int
    lib.emf_exr_write.argtypes = [c.c_char_p, f32p, c.c_int, c.c_int,
                                  c.c_int, c.c_int]
    lib.emf_png_read_rgb8.restype = u8p
    lib.emf_png_read_rgb8.argtypes = [c.c_char_p, i32p, i32p]
    lib.emf_png_read_gray16.restype = u16p
    lib.emf_png_read_gray16.argtypes = [c.c_char_p, i32p, i32p]
    lib.emf_png_write_rgb8.restype = c.c_int
    lib.emf_png_write_rgb8.argtypes = [c.c_char_p, u8p, c.c_int, c.c_int]
    lib.emf_png_write_gray16.restype = c.c_int
    lib.emf_png_write_gray16.argtypes = [c.c_char_p, u16p, c.c_int, c.c_int]
    lib.emf_free.restype = None
    lib.emf_free.argtypes = [c.c_void_p]

    lib.emf_prefetch_create.restype = c.c_void_p
    lib.emf_prefetch_create.argtypes = [
        c.POINTER(c.c_char_p), c.POINTER(c.c_char_p), c.c_long, c.c_int,
        c.c_int, c.c_float, c.c_float]
    lib.emf_prefetch_dims.restype = None
    lib.emf_prefetch_dims.argtypes = [c.c_void_p, i32p, i32p,
                                      c.POINTER(c.c_long)]
    lib.emf_prefetch_next.restype = c.c_long
    lib.emf_prefetch_next.argtypes = [c.c_void_p, u8p, f32p]
    lib.emf_prefetch_destroy.restype = None
    lib.emf_prefetch_destroy.argtypes = [c.c_void_p]

    lib.emf_writer_create.restype = c.c_void_p
    lib.emf_writer_create.argtypes = []
    lib.emf_writer_submit_ply.restype = None
    lib.emf_writer_submit_ply.argtypes = [c.c_void_p, c.c_char_p, f32p, f32p,
                                          c.c_long, i32p, c.c_long]
    lib.emf_writer_submit_volume.restype = None
    lib.emf_writer_submit_volume.argtypes = [c.c_void_p, c.c_char_p, f32p,
                                             c.c_int, c.c_int, c.c_int,
                                             c.c_float]
    lib.emf_writer_submit_png16.restype = None
    lib.emf_writer_submit_png16.argtypes = [c.c_void_p, c.c_char_p, u16p,
                                            c.c_int, c.c_int]
    lib.emf_writer_submit_png8.restype = None
    lib.emf_writer_submit_png8.argtypes = [c.c_void_p, c.c_char_p, u8p,
                                           c.c_int, c.c_int]
    lib.emf_writer_wait.restype = c.c_long
    lib.emf_writer_wait.argtypes = [c.c_void_p]
    lib.emf_writer_destroy.restype = None
    lib.emf_writer_destroy.argtypes = [c.c_void_p]
    return lib


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib = False
            return None
        try:
            _lib = _bind(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _lib = False
            return None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _as_f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ------------------------------------------------------------------ codecs

def read_exr(path: str) -> Optional[np.ndarray]:
    """Reads an EXR; returns (H, W) or (H, W, C) float32, or None."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    p = lib.emf_exr_read(path.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c))
    if not p:
        return None
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(p, shape=(n,)).copy()
    lib.emf_free(p)
    arr = arr.reshape(h.value, w.value, c.value)
    return arr[..., 0] if c.value == 1 else arr


def write_exr(path: str, img: np.ndarray, compression: int = 3,
              as_half: bool = False) -> bool:
    """Writes a single-channel float32 EXR (compression 0=NONE, 3=ZIP)."""
    lib = get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w = img.shape
    return lib.emf_exr_write(path.encode(), _as_f32p(img), w, h,
                             compression, int(as_half)) == 0


def read_png_rgb(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    p = lib.emf_png_read_rgb8(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    arr = np.ctypeslib.as_array(p, shape=(h.value * w.value * 3,)).copy()
    lib.emf_free(p)
    return arr.reshape(h.value, w.value, 3)


def read_png_gray16(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    p = lib.emf_png_read_gray16(path.encode(), ctypes.byref(w),
                                ctypes.byref(h))
    if not p:
        return None
    arr = np.ctypeslib.as_array(p, shape=(h.value * w.value,)).copy()
    lib.emf_free(p)
    return arr.reshape(h.value, w.value)


def write_png_rgb(path: str, img: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return lib.emf_png_write_rgb8(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h) == 0


def write_png_gray16(path: str, img: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, dtype=np.uint16)
    h, w = img.shape
    return lib.emf_png_write_gray16(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        w, h) == 0


# -------------------------------------------------------------- prefetcher

class NativePrefetcher:
    """Multi-worker native frame decoder with in-order delivery."""

    def __init__(self, rgb_paths: Sequence[Optional[str]],
                 depth_paths: Sequence[str], n_workers: int = 4,
                 capacity: int = 30, depth_scale: float = 1.0,
                 depth_clamp: float = 100.0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        n = len(depth_paths)
        rgb_arr = (ctypes.c_char_p * n)(
            *[(p or "").encode() for p in rgb_paths])
        d_arr = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
        self._h = lib.emf_prefetch_create(rgb_arr, d_arr, n, n_workers,
                                          capacity, depth_scale, depth_clamp)
        if not self._h:
            raise RuntimeError(f"prefetch_create failed ({depth_paths[0]})")
        w = ctypes.c_int32()
        hh = ctypes.c_int32()
        nn = ctypes.c_long()
        lib.emf_prefetch_dims(self._h, ctypes.byref(w), ctypes.byref(hh),
                              ctypes.byref(nn))
        self.width, self.height, self.num_frames = w.value, hh.value, nn.value

    def next(self) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
        """Returns (rgb (H,W,3) u8, depth (H,W) f32, index) or None at end."""
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        depth = np.empty((self.height, self.width), np.float32)
        idx = self._lib.emf_prefetch_next(
            self._h, rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _as_f32p(depth))
        if idx == -1:
            return None
        if idx == -2:
            raise RuntimeError("frame decode failed")
        return rgb, depth, int(idx)

    def close(self):
        if self._h:
            self._lib.emf_prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ------------------------------------------------------------ async writer

class AsyncWriter:
    """Streams meshes/volumes/images to disk on a native background thread."""

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.emf_writer_create()

    def submit_ply(self, path: str, vertices: np.ndarray, normals: np.ndarray,
                   triangles: np.ndarray):
        v = np.ascontiguousarray(vertices, np.float32)
        n = np.ascontiguousarray(normals, np.float32)
        t = np.ascontiguousarray(triangles, np.int32)
        self._lib.emf_writer_submit_ply(
            self._h, path.encode(), _as_f32p(v), _as_f32p(n), len(v),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(t))

    def submit_volume(self, path: str, vol: np.ndarray, voxel_size: float):
        v = np.ascontiguousarray(vol, np.float32)
        rz, ry, rx = v.shape
        # reference format stores (X, Y, Z) resolution order
        self._lib.emf_writer_submit_volume(self._h, path.encode(),
                                           _as_f32p(v), rx, ry, rz,
                                           voxel_size)

    def submit_png16(self, path: str, img: np.ndarray):
        im = np.ascontiguousarray(img, np.uint16)
        h, w = im.shape
        self._lib.emf_writer_submit_png16(
            self._h, path.encode(),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), w, h)

    def submit_png8(self, path: str, img: np.ndarray):
        im = np.ascontiguousarray(img, np.uint8)
        h, w = im.shape[:2]
        self._lib.emf_writer_submit_png8(
            self._h, path.encode(),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h)

    def wait(self) -> int:
        """Blocks until all writes land; returns error count."""
        return int(self._lib.emf_writer_wait(self._h))

    def close(self):
        if self._h:
            self._lib.emf_writer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
