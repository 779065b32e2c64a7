"""Native (C++) components, ctypes-bound with pure-Python fallbacks.

Scope rationale (vs the reference, which is 100% native Rust): on TPU the
compute path's "native code" is the Pallas kernels (rten_tpu/kernels/) —
XLA compiles them to TPU machine code, replacing rten-gemm/rten-simd. The
host side of this engine is orchestration, where Python is not on the hot
path with ONE exception: per-piece tokenizer encode loops, which run per
request in serving. Those live here (bpe.cpp). The ONNX protobuf parser
stays Python: measured at ~10ms per 100MB model (raw tensor data is
zero-copy), so a C++ scanner would buy nothing.

The library builds lazily with g++ on first import and caches the .so next
to the sources; failures degrade silently to the Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librten_native.so")
_SRC = [os.path.join(_DIR, "bpe.cpp"), os.path.join(_DIR, "imageproc.cpp")]
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    srcs = [s for s in _SRC if os.path.exists(s)]
    if not srcs:
        return None
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest_src:
        return _SO
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            path = _build()
            if path is not None:
                try:
                    lib = ctypes.CDLL(path)
                    _configure(lib)
                    _lib = lib
                except OSError:
                    _lib = None
    return _lib


def _configure(lib):
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rten_bpe_create.restype = ctypes.c_void_p
    lib.rten_bpe_create.argtypes = [
        c_char_pp, i32p, ctypes.c_int32, c_char_pp, c_char_pp, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.rten_bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.rten_bpe_encode.restype = ctypes.c_int32
    lib.rten_bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, i32p, ctypes.c_int32,
    ]
    lib.rten_wordpiece_create.restype = ctypes.c_void_p
    lib.rten_wordpiece_create.argtypes = [
        c_char_pp, i32p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.rten_wordpiece_destroy.argtypes = [ctypes.c_void_p]
    lib.rten_wordpiece_encode.restype = ctypes.c_int32
    lib.rten_wordpiece_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, i32p, ctypes.c_int32,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rten_find_contours.restype = ctypes.c_int32
    lib.rten_find_contours.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int32,
        i32p, ctypes.c_int32,
    ]
    lib.rten_nms.restype = ctypes.c_int32
    lib.rten_nms.argtypes = [
        f32p, f32p, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, i32p,
    ]


def _string_table(strings: List[str]):
    arr = (ctypes.c_char_p * len(strings))()
    encoded = [s.encode("utf-8") for s in strings]
    for i, s in enumerate(encoded):
        arr[i] = s
    return arr, encoded  # keep `encoded` alive with the array


class NativeBpe:
    """ctypes wrapper over the C++ BPE encoder; raises if lib missing."""

    def __init__(self, vocab: dict, merges, csp: str = "", eows: str = "",
                 unk_id: int = -1):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        tokens = list(vocab.keys())
        ids = (ctypes.c_int32 * len(tokens))(*[vocab[t] for t in tokens])
        tok_arr, self._keep1 = _string_table(tokens)
        left_arr, self._keep2 = _string_table([m[0] for m in merges])
        right_arr, self._keep3 = _string_table([m[1] for m in merges])
        self._h = lib.rten_bpe_create(
            tok_arr, ids, len(tokens), left_arr, right_arr, len(merges),
            csp.encode(), eows.encode(), unk_id,
        )
        self._buf = (ctypes.c_int32 * 4096)()

    def encode_piece(self, piece: str) -> List[int]:
        data = piece.encode("utf-8")
        n = self._lib.rten_bpe_encode(self._h, data, len(data), self._buf, 4096)
        if n < 0:
            raise ValueError("piece too long for native buffer")
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.rten_bpe_destroy(self._h)
        except Exception:
            pass


class NativeWordPiece:
    def __init__(self, vocab: dict, prefix: str, unk_id: int, max_chars: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        tokens = list(vocab.keys())
        ids = (ctypes.c_int32 * len(tokens))(*[vocab[t] for t in tokens])
        tok_arr, self._keep = _string_table(tokens)
        self._h = lib.rten_wordpiece_create(
            tok_arr, ids, len(tokens), prefix.encode(), unk_id, max_chars
        )
        self._buf = (ctypes.c_int32 * 4096)()

    def encode_piece(self, piece: str) -> List[int]:
        data = piece.encode("utf-8")
        n = self._lib.rten_wordpiece_encode(self._h, data, len(data), self._buf, 4096)
        if n < 0:
            raise ValueError("piece too long for native buffer")
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.rten_wordpiece_destroy(self._h)
        except Exception:
            pass
