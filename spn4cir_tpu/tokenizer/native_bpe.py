"""ctypes binding for the native CLIP-BPE fast path (native/bpe.cpp).

Built on first use with g++ (same convention as the native image loader);
`SPN4CIR_NATIVE=0` opts out. `NativeBpe.encode` returns None whenever the
input leaves the ASCII fast-path contract (bytes >= 0x80, HTML entities,
literal special tokens, unknown symbols) — the caller then uses the Python
tokenizer, so results are always byte-identical to `tokenizer/bpe.py`.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "native", "bpe.cpp")
_SO = os.path.join(os.path.dirname(__file__), os.pardir, "native", "_bpe.so")
_BUILD_LOCK = threading.Lock()

_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    # build to a per-process temp name + atomic rename: concurrent processes
    # racing `g++ -o <same path>` could CDLL a partially written .so
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", tmp]
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
        if os.environ.get("SPN4CIR_NATIVE", "1") in ("0", "false"):
            _build_error = "disabled via SPN4CIR_NATIVE=0"
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
        if not hasattr(lib, "bpe_encode_batch"):
            # a stale .so from before the batch API whose mtime defeated
            # the rebuild guard (mtime-preserving deploys): rebuild once,
            # and disable the native path rather than crash if that fails
            err = _build()
            if err is None:
                # glibc dlopen dedupes by pathname, so re-CDLLing _SO would
                # return the already-mapped stale object; load the rebuilt
                # library through a unique path (the mapping survives unlink)
                fresh = f"{_SO}.{os.getpid()}.reload"
                try:
                    shutil.copyfile(_SO, fresh)
                    lib = ctypes.CDLL(fresh)
                except OSError as exc:  # pragma: no cover
                    _build_error = str(exc)
                    return
                finally:
                    try:
                        os.unlink(fresh)
                    except OSError:  # pragma: no cover
                        pass
            if not hasattr(lib, "bpe_encode_batch"):  # pragma: no cover
                _build_error = err or "stale _bpe.so lacks bpe_encode_batch"
                return
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int
        lib.bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int]
        lib.bpe_encode_batch.restype = None
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int]
        _lib = lib


def native_available() -> bool:
    _load()
    return _lib is not None


def _ascii(s: str) -> bool:
    try:
        s.encode("ascii")
        return True
    except UnicodeEncodeError:
        return False


class NativeBpe:
    def __init__(self, tokenizer):
        _load()
        if _lib is None:
            raise RuntimeError(_build_error or "native bpe unavailable")
        # only pure-ASCII vocab/merge entries can ever apply on the ASCII
        # fast path (printable ASCII is identity under the byte table)
        enc = "".join(f"{tok}\t{i}\n" for tok, i in tokenizer.encoder.items()
                      if _ascii(tok))
        ranks = "".join(f"{a}\t{b}\t{r}\n"
                        for (a, b), r in tokenizer._rank.items()
                        if _ascii(a) and _ascii(b))
        self._h = _lib.bpe_create(enc.encode(), ranks.encode())

    def __del__(self):  # pragma: no cover
        if _lib is not None and getattr(self, "_h", None):
            _lib.bpe_destroy(self._h)

    def encode(self, text: str) -> Optional[List[int]]:
        """BPE ids, or None when the text needs the Python fallback.

        Thread-safe: the output buffer is per-call (the C side's word cache
        has its own mutex)."""
        if "\x00" in text:
            # a C string would silently truncate at the NUL; Python path
            # tokenizes the full text
            return None
        try:
            raw = text.encode("utf-8")
        except UnicodeEncodeError:  # pragma: no cover
            return None
        buf = np.empty(512, np.int32)
        while True:
            n = _lib.bpe_encode(
                self._h, raw,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(buf))
            if n < 0:
                return None
            if n <= len(buf):
                return buf[:n].tolist()
            buf = np.empty(n, np.int32)

    def encode_batch(self, texts: List[str], max_ids: int = 256,
                     threads: int = 0) -> List[Optional[List[int]]]:
        """Encode many texts in ONE FFI call (C-side row threads).

        Returns one entry per text: the id list, or None where the text
        needs the Python fallback (non-ASCII contract, NUL, or a row
        longer than `max_ids` — the caller re-encodes those rows)."""
        n = len(texts)
        if n == 0:
            return []
        raws: List[Optional[bytes]] = []
        for t in texts:
            if "\x00" in t:
                raws.append(None)  # C string would truncate at the NUL
            else:
                try:
                    raws.append(t.encode("utf-8"))
                except UnicodeEncodeError:  # pragma: no cover
                    raws.append(None)
        offsets = np.empty(n, np.int64)
        blob = bytearray()
        for i, raw in enumerate(raws):
            offsets[i] = len(blob)
            blob += (raw if raw is not None else b"") + b"\x00"
        out = np.empty((n, max_ids), np.int32)
        lens = np.empty(n, np.int32)
        _lib.bpe_encode_batch(
            self._h, bytes(blob),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_ids, threads)
        results: List[Optional[List[int]]] = []
        for i in range(n):
            if raws[i] is None or lens[i] < 0 or lens[i] > max_ids:
                results.append(None)
            else:
                results.append(out[i, :lens[i]].tolist())
        return results


# weak keys: a collected tokenizer must not leave a stale entry behind for
# a new object reusing its id()
import weakref  # noqa: E402

_instances: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_instances_lock = threading.Lock()


def get_native(tokenizer) -> Optional[NativeBpe]:
    """Per-tokenizer singleton; None when the toolchain is unavailable."""
    if not native_available():
        return None
    with _instances_lock:
        inst = _instances.get(tokenizer)
        if inst is None:
            inst = _instances[tokenizer] = NativeBpe(tokenizer)
        return inst
