"""ctypes bindings for the native C++ runtime library (csrc/).

Where the reference's runtime is C++, this framework keeps the host-side hot
paths native too: WAV parsing/decoding, the threaded batch audio loader,
ConstFst parsing, backtrace and scoring.  Every entry point has a pure
Python fallback (the modules that call these), so the library is an
accelerator, not a requirement.  Build with `make -C csrc` (done on demand
here if a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO_PATH = os.path.join(_CSRC, "libcatears_native.so")


def _build() -> bool:
    try:
        proc = subprocess.run(["make", "-C", _CSRC, "-s"],
                              capture_output=True, timeout=120)
        return proc.returncode == 0 and os.path.exists(_SO_PATH)
    except Exception:  # noqa: BLE001
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.ce_parse_wav_header.restype = ctypes.c_int
    lib.ce_pcm_to_float.restype = ctypes.c_int
    lib.ce_load_wav_batch.restype = ctypes.c_int
    lib.ce_parse_const_fst.restype = ctypes.c_int
    lib.ce_backtrace.restype = ctypes.c_int
    lib.ce_edit_distance.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def load_wav_batch(paths: List[str],
                   num_threads: int = 0) -> Optional[List[np.ndarray]]:
    """Threaded native batch WAV load; None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    count = len(paths)
    sizes = [os.path.getsize(p) for p in paths]
    # Conservative capacity: whole file as 8-bit samples
    offsets = np.zeros(count, np.int64)
    total = 0
    for i, s in enumerate(sizes):
        offsets[i] = total
        total += s  # >= payload samples for all widths
    out = np.zeros(total, np.float32)
    lengths = np.zeros(count, np.int64)
    c_paths = (ctypes.c_char_p * count)(
        *[p.encode("utf-8") for p in paths])
    rc = lib.ce_load_wav_batch(
        c_paths, ctypes.c_int32(count),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(num_threads))
    if rc != 0:
        return None
    result = []
    for i in range(count):
        if lengths[i] < 0:
            raise IOError(f"native wav load failed for {paths[i]} "
                          f"(code {lengths[i]})")
        result.append(out[offsets[i]:offsets[i] + lengths[i]].copy())
    return result


def parse_const_fst(data: bytes):
    """Native ConstFst parse -> (start, final, pos, count, arcs[A,4]) or None."""
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    start = ctypes.c_int64()
    ns = ctypes.c_int64()
    na = ctypes.c_int64()
    rc = lib.ce_parse_const_fst(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size), ctypes.byref(start), ctypes.byref(ns),
        ctypes.byref(na), None, None, None, None)
    if rc != 0:
        return None
    final = np.zeros(ns.value, np.float32)
    pos = np.zeros(ns.value, np.int64)
    cnt = np.zeros(ns.value, np.int32)
    arcs = np.zeros((na.value, 4), np.int32)
    rc = lib.ce_parse_const_fst(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size), ctypes.byref(start), ctypes.byref(ns),
        ctypes.byref(na),
        final.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return start.value, final, pos, cnt, arcs


def backtrace(prev_slot: np.ndarray, words: np.ndarray,
              start_slot: int) -> Optional[List[int]]:
    """Native backtrace over stacked [T, K] / [T, K, W] traces."""
    lib = load()
    if lib is None:
        return None
    t, k = prev_slot.shape
    w = words.shape[2]
    prev_c = np.ascontiguousarray(prev_slot, np.int32)
    words_c = np.ascontiguousarray(words, np.int32)
    out = np.zeros(t * w + 8, np.int32)
    n = lib.ce_backtrace(
        prev_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        words_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(t), ctypes.c_int32(k), ctypes.c_int32(w),
        ctypes.c_int32(start_slot),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(out.size))
    if n < 0:
        return None
    return [int(x) for x in out[:n]]


def edit_distance(ref: List[int], hyp: List[int]) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    r = np.asarray(ref, np.int32)
    h = np.asarray(hyp, np.int32)
    return int(lib.ce_edit_distance(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(r.size),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(h.size)))
