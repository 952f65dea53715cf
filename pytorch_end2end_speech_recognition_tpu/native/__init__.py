"""ctypes bindings for the native runtime library (asrnative.cpp).

Builds lazily with g++ on first import (cached next to the source, keyed by
source mtime); every entry point has a pure-Python fallback, so the package
works without a toolchain. See asrnative.cpp for the capability-parity note
(reference's C++ data path + scorers, SURVEY.md §2b).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "asrnative.cpp"
_LIB = _HERE / "libasrnative.so"
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001 — any failure -> Python fallback
        print(f"[native] build failed, using Python fallbacks: {e}",
              file=sys.stderr)
        return False


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if os.environ.get("ASR_TPU_NO_NATIVE"):
        _build_failed = True
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.asr_read_wav.restype = ctypes.c_long
        lib.asr_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.asr_read_flac.restype = ctypes.c_long
        lib.asr_read_flac.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.asr_read_audio.restype = ctypes.c_long
        lib.asr_read_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.asr_load_batch.restype = ctypes.c_long
        lib.asr_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ]
        lib.asr_levenshtein.restype = ctypes.c_long
        lib.asr_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
        ]
        _lib = lib
    except OSError as e:
        print(f"[native] load failed, using Python fallbacks: {e}",
              file=sys.stderr)
        _build_failed = True
    return _lib


def read_wav_native(path: str, max_samples: int = 16000 * 120):
    """(samples float32, sr) via C++; raises RuntimeError if unavailable."""
    return _read_native("asr_read_wav", path, max_samples)


def read_flac_native(path: str, max_samples: int = 16000 * 120):
    """(samples float32, sr) via the C++ FLAC decoder (asrnative.cpp)."""
    return _read_native("asr_read_flac", path, max_samples)


def read_audio_native(path: str, max_samples: int = 16000 * 120):
    """(samples float32, sr): C++ container-sniffed WAV/FLAC decode."""
    return _read_native("asr_read_audio", path, max_samples)


def _read_native(fn_name: str, path: str, max_samples: int):
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty(max_samples, np.float32)
    sr = ctypes.c_int(0)
    n = getattr(lib, fn_name)(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr),
    )
    if n < 0:
        raise ValueError(f"{path}: native decode failed ({fn_name})")
    return out[:n].copy(), sr.value


def load_batch_native(
    paths: list[str], out: np.ndarray, lens: np.ndarray,
    expect_sr: int = 16000, n_threads: int = 0,
) -> int:
    """Parallel decode into a preallocated (B, Ts) float32 batch buffer.

    Rows that fail (or need resampling) get lens[i]==0 for Python fallback.
    Returns rows decoded natively."""
    lib = get_lib()
    if lib is None:
        return 0
    assert out.dtype == np.float32 and out.flags.c_contiguous
    assert lens.dtype == np.int32
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    return lib.asr_load_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[1], lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        expect_sr, n_threads,
    )


def levenshtein(a, b) -> int:
    """Token-sequence edit distance via C++; raises if unavailable
    (metrics.wer falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sym = {t: i for i, t in enumerate(dict.fromkeys(list(a) + list(b)))}
    aa = np.asarray([sym[t] for t in a], np.int32)
    bb = np.asarray([sym[t] for t in b], np.int32)
    return int(lib.asr_levenshtein(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(bb),
    ))
