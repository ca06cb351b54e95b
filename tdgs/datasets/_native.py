"""Native loader bindings: compile-on-import + ctypes.

The design mirror of the reference's JIT build system
(gsplat/cuda/_backend.py:45-234: glob sources, compile at import with a
cache, env knobs): native/tdgs_loader.cpp is compiled once with g++ into a
cached shared library, then bound with ctypes. Set TDGS_NO_NATIVE=1 to
force the PIL fallback.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "tdgs_loader.cpp",
    )


def _build(src: str) -> Optional[str]:
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.environ.get(
        "TDGS_CACHE_DIR", os.path.expanduser("~/.cache/tdgs")
    )
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"libtdgs_loader_{tag}.so")
    if os.path.exists(out):
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out,
        "-ljpeg", "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        if os.environ.get("TDGS_VERBOSE"):
            print("native build failed:", getattr(e, "stderr", e))
        return None


def get_lib():
    """The compiled loader library, or None (PIL fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("TDGS_NO_NATIVE"):
            return None
        path = _build(_source_path())
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.tdgs_decode_image.restype = ctypes.c_int
        lib.tdgs_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tdgs_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.tdgs_prefetcher_create.restype = ctypes.c_void_p
        lib.tdgs_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tdgs_prefetcher_request.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tdgs_prefetcher_get.restype = ctypes.c_int
        lib.tdgs_prefetcher_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tdgs_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _take_buffer(lib, data_p, w: int, h: int) -> np.ndarray:
    n = w * h * 3
    arr = np.ctypeslib.as_array(data_p, shape=(n,)).reshape(h, w, 3).copy()
    lib.tdgs_free(data_p)
    return arr


def decode_image(path: str, factor: int = 1) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG to RGB8 [H, W, 3] with integer box downsampling;
    None if the native lib is unavailable (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    data_p = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.tdgs_decode_image(
        path.encode(), factor, ctypes.byref(data_p), ctypes.byref(w),
        ctypes.byref(h),
    )
    if not ok:
        return None
    return _take_buffer(lib, data_p, w.value, h.value)


class NativePrefetcher:
    """Threaded decode-ahead over a list of image paths (the counterpart of
    torch DataLoader worker processes)."""

    def __init__(self, paths: List[str], factor: int = 1, n_threads: int = 4):
        self.lib = get_lib()
        assert self.lib is not None, "native loader unavailable"
        self._paths_arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self.handle = self.lib.tdgs_prefetcher_create(
            self._paths_arr, len(paths), factor, n_threads
        )
        self.n = len(paths)

    def request(self, idx: int) -> None:
        self.lib.tdgs_prefetcher_request(self.handle, idx)

    def get(self, idx: int) -> Optional[np.ndarray]:
        data_p = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ok = self.lib.tdgs_prefetcher_get(
            self.handle, idx, ctypes.byref(data_p), ctypes.byref(w),
            ctypes.byref(h),
        )
        if not ok:
            return None
        return _take_buffer(self.lib, data_p, w.value, h.value)

    def close(self):
        if self.handle:
            self.lib.tdgs_prefetcher_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
