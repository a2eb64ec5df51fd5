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
        lib.loader_stage_raw_batch.restype = ctypes.c_int
        lib.loader_stage_raw_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8),
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


class NativeRawStager:
    """Threaded decode-only staging for the on-device fused preprocess
    (`--device_preprocess`): paths -> ((B, C, C, 3) uint8 canvases,
    (B, 2) int32 padded extents). The host skips the bicubic resize — the
    dominant preprocess cost — which runs fused with the encoder on the
    chip (ops/preprocess.py:preprocess_batch_dynamic)."""

    def __init__(self, kind: str, canvas: int, target_ratio: float = 1.25,
                 num_threads: int = 0, fallback=None):
        """`fallback(path) -> ((C, C, 3) uint8, (ph, pw))` handles images
        the C++ decoder declines (see NativeLoader); without one they raise."""
        _load()
        if _lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self.fallback = fallback
        # blip_eval stages like 'clip': raw paste, no pad
        self.kind = _KINDS.get(kind, 0)
        self.canvas = canvas
        self.target_ratio = float(target_ratio)
        threads = num_threads or min(8, os.cpu_count() or 1)
        self._pool = _lib.loader_create(threads)

    def __del__(self):  # pragma: no cover
        if getattr(self, "_pool", None) and _lib is not None:
            _lib.loader_destroy(self._pool)
            self._pool = None

    def stage_batch(self, paths: Sequence[str],
                    out: Optional[np.ndarray] = None,
                    extents: Optional[np.ndarray] = None):
        """Stage into `out`/`extents` when given (shared-memory blocks in
        MPLoader workers) or freshly allocated arrays."""
        n = len(paths)
        c = self.canvas
        if out is None:
            out = np.empty((n, c, c, 3), np.uint8)
        if extents is None:
            extents = np.empty((n, 2), np.int32)
        assert out.dtype == np.uint8 and out[: n].shape == (n, c, c, 3)
        assert extents.dtype == np.int32
        status = np.zeros(n, np.int8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = _lib.loader_stage_raw_batch(
            self._pool, arr, n, self.kind, c,
            ctypes.c_float(self.target_ratio),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            extents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
        if failures:
            bad = np.nonzero(status)[0]
            if self.fallback is None:
                raise IOError(f"native stager failed on {failures}/{n} images"
                              f" (first: {paths[int(bad[0])]!r})")
            for i in bad:
                canv, ext = self.fallback(paths[int(i)])
                out[int(i)] = canv
                extents[int(i)] = ext
        return out, extents
