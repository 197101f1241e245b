"""ctypes bindings for the native C++ video decoder (native/videodec.cpp).

The host-side equivalent of decord's C++ ``VideoReader.get_batch``
(reference dataset/base/base_dataset.py:295): clip-seek frame decode into
preallocated numpy buffers, with an optional fused short-side resize, and a
GIL-free batch API running clips on a C++ thread pool.

Falls back to the OpenCV path automatically when the shared library is not
built; ``ensure_built()`` compiles it on first use with the repo Makefile.
"""

import ctypes
import functools
import os
import subprocess
import threading

import numpy as np

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdistvideo.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def ensure_built():
    """Build the shared library if missing. Returns True on success."""
    global _build_failed
    if os.path.exists(_LIB_PATH):
        return True
    if _build_failed:
        return False
    with _lock:
        if os.path.exists(_LIB_PATH):
            return True
        if _build_failed:
            # another thread already ran (and failed) the build while we
            # waited on the lock — don't repeat the doomed make per thread
            return False
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, text=True, timeout=120)
            logger.info("Built native video decoder at %s", _LIB_PATH)
            return True
        except Exception as e:
            logger.warning("native decoder build failed (%s); using OpenCV "
                           "fallback", e)
            _build_failed = True
            return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dist_video_probe.restype = ctypes.c_int
            lib.dist_video_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.dist_video_decode.restype = ctypes.c_int
            lib.dist_video_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int]
            lib.dist_video_decode_batch.restype = ctypes.c_int
            lib.dist_video_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            _lib = lib
    return _lib


def available():
    return get_lib() is not None


@functools.lru_cache(maxsize=65536)
def probe(path):
    """(num_frames, fps, w, h) via libavformat. Cached per path: dataset
    videos are immutable and both the sampler (probe_video) and a
    native-resolution decode() would otherwise open the container twice
    per sample."""
    lib = get_lib()
    n = ctypes.c_int64()
    fps = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.dist_video_probe(path.encode(), ctypes.byref(n),
                              ctypes.byref(fps), ctypes.byref(w),
                              ctypes.byref(h))
    if rc != 0:
        raise IOError(f"native probe failed ({rc}) for {path}")
    return int(n.value), float(fps.value), int(w.value), int(h.value)


def decode(path, indices, out_h=0, out_w=0):
    """Decode frame ``indices`` -> (T, H, W, 3) uint8 RGB. out_h/out_w of 0
    keep the native resolution; otherwise the resize fuses into the decode."""
    lib = get_lib()
    indices = np.ascontiguousarray(indices, np.int64)
    if out_h <= 0 or out_w <= 0:
        _, _, w, h = probe(path)
        out_h, out_w = h, w
    out = np.empty((len(indices), out_h, out_w, 3), np.uint8)
    rc = lib.dist_video_decode(
        path.encode(), indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w)
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_batch(paths, indices_list, out_h, out_w, num_threads=8):
    """Decode many clips concurrently in C++ (no GIL). Returns a list of
    (T_i, out_h, out_w, 3) uint8 arrays."""
    lib = get_lib()
    n = len(paths)
    offsets = np.zeros(n + 1, np.int64)
    for i, idx in enumerate(indices_list):
        offsets[i + 1] = offsets[i] + len(idx)
    flat = np.ascontiguousarray(np.concatenate(indices_list), np.int64)
    out = np.empty((int(offsets[-1]), out_h, out_w, 3), np.uint8)
    statuses = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.dist_video_decode_batch(
        c_paths, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
        num_threads, statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        bad = [paths[i] for i in range(n) if statuses[i] != 0]
        raise IOError(f"native batch decode failed for {bad[:3]}")
    return [out[offsets[i]:offsets[i + 1]] for i in range(n)]
