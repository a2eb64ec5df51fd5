"""Native (C++) data loader bindings.

`loader.cpp` implements threaded image decode (libjpeg/libpng) + the full
CIR preprocess pipeline with geometry parity to
`spn4cir_tpu.data.transforms.ImageTransform`. Bound via ctypes (no pybind11
in the image); the shared object is built on first use with g++ and cached
next to the source. Falls back cleanly when a toolchain is unavailable —
callers use `native_available()` / `get_loader(...)`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_loader.so")
_BUILD_LOCK = threading.Lock()
_KINDS = {"clip": 0, "squarepad": 1, "targetpad": 2}

_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile loader.cpp -> _loader.so; returns an error string or None.
    Builds to a per-process temp name + atomic rename so concurrent
    processes can't CDLL a partially written .so."""
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", tmp, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as exc:  # pragma: no cover
        return f"build failed: {exc}"
    if proc.returncode != 0:  # pragma: no cover
        return f"build failed: {proc.stderr[-2000:]}"
    os.replace(tmp, _SO)
    return None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return
    with _BUILD_LOCK:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            err = _build()
            if err:
                _build_error = err
                return
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as exc:  # pragma: no cover
            _build_error = str(exc)
            return
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_decode_batch.restype = ctypes.c_int
        lib.loader_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int8),
        ]
        _lib = lib


def native_available() -> bool:
    _load()
    return _lib is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeLoader:
    """Threaded decode+preprocess: paths -> (B, dim, dim, 3) float32 HWC.

    Drop-in replacement for mapping `ImageTransform` over PIL decodes
    (`spn4cir_tpu.data.datasets._decode_batch`)."""

    def __init__(self, kind: str, dim: int, target_ratio: float = 1.25,
                 mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
                 std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
                 num_threads: int = 0, fallback=None):
        """`fallback(path) -> (dim, dim, 3) float32` handles images the C++
        decoder declines for parity reasons (status 2: palette-mode PNGs,
        which Pillow resizes NEAREST and pads with palette[0]) or fails on
        (status 1). Without a fallback those images raise IOError."""
        _load()
        if _lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self.fallback = fallback
        self.kind = _KINDS[kind]
        self.dim = dim
        self.target_ratio = float(target_ratio)
        self._mean = (ctypes.c_float * 3)(*[float(m) for m in mean])
        self._std = (ctypes.c_float * 3)(*[float(s) for s in std])
        threads = num_threads or min(8, os.cpu_count() or 1)
        self._pool = _lib.loader_create(threads)

    def __del__(self):  # pragma: no cover
        if getattr(self, "_pool", None) and _lib is not None:
            _lib.loader_destroy(self._pool)
            self._pool = None

    def decode_batch(self, paths: Sequence[str]) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, self.dim, self.dim, 3), np.float32)
        status = np.zeros(n, np.int8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = _lib.loader_decode_batch(
            self._pool, arr, n, self.kind, self.dim,
            ctypes.c_float(self.target_ratio), self._mean, self._std,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
        if failures:
            bad = np.nonzero(status)[0]
            if self.fallback is None:
                raise IOError(f"native loader failed on {failures}/{n} images"
                              f" (first: {paths[int(bad[0])]!r})")
            for i in bad:
                out[int(i)] = self.fallback(paths[int(i)])
        return out
