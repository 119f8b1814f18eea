"""Native (C++) host runtime — built on demand, Python fallback always.

The TPU compute path lives entirely in XLA programs; the host-side work
that remains measurable is the prefix CTC beam search, a dict-and-loop
algorithm that Python executes ~100x slower than C++ — with LM shallow
fusion it dominates eval wall-clock (the same bottleneck SURVEY §2.5 flags
in the reference's pure-Python beam, metrics.py:74-145).

`native/beam.cpp` implements the exact algorithm of decode/beam.py +
decode/lm.py behind a C ABI; this module compiles it with the toolchain's
g++ on first use (cached next to the source; rebuilt when the source
changes) and binds it with ctypes. Every caller falls back to the Python
implementation when no compiler is available, and the parity test
(tests/test_native_beam.py) pins C++ == Python on random and LM-fused
cases.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "beam.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "ONEBIT_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "onebit_asr_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, f"libonebit_beam_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.onebit_lm_create.restype = ctypes.c_void_p
    lib.onebit_lm_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int64,
    ]
    lib.onebit_lm_free.argtypes = [ctypes.c_void_p]
    lib.onebit_ctc_beam_search.restype = ctypes.c_int32
    lib.onebit_ctc_beam_search.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,  # log_probs, T, V
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # blank, beam, topk
        ctypes.c_void_p, ctypes.c_float, ctypes.c_float,  # lm, w, bonus
        ctypes.c_void_p, ctypes.c_int32,  # out, max_out
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled host library, or None (callers use the Python path)."""
    global _LIB, _TRIED
    if not _TRIED:
        with _LOCK:
            if not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


class NativeLM:
    """C++-side handle for a decode.lm.NGramLM (built once, reused across
    utterances)."""

    def __init__(self, lm):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        keys, vals = [], []
        for n in range(1, lm.order + 1):
            for k, v in lm.counts[n].items():
                keys.append((n,) + k + (0,) * (lm.order - n))
                vals.append(v)
        karr = (np.asarray(keys, np.int64) if keys
                else np.zeros((0, lm.order + 1), np.int64))
        varr = np.asarray(vals, np.int64)
        self._lib = lib
        self._handle = lib.onebit_lm_create(
            karr.ctypes.data_as(ctypes.c_void_p),
            varr.ctypes.data_as(ctypes.c_void_p),
            np.int64(len(varr)), np.int32(lm.order), np.int64(lm.total),
        )

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.onebit_lm_free(self._handle)
            self._handle = None


def ctc_beam_search_native(
    log_probs: np.ndarray,  # [T, V] float32
    beam_size: int = 10,
    blank_id: int = 3,
    top_k_per_t: int = 20,
    native_lm: Optional[NativeLM] = None,
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
) -> List[int]:
    lib = get_lib()
    assert lib is not None, "call get_lib() first"
    lp = np.ascontiguousarray(log_probs, np.float32)
    T, V = lp.shape
    out = np.zeros((T,), np.int32)
    n = lib.onebit_ctc_beam_search(
        lp.ctypes.data_as(ctypes.c_void_p), np.int32(T), np.int32(V),
        np.int32(blank_id), np.int32(beam_size), np.int32(top_k_per_t),
        (native_lm._handle if native_lm is not None else None),
        np.float32(lm_weight), np.float32(length_bonus),
        out.ctypes.data_as(ctypes.c_void_p), np.int32(T),
    )
    return out[:n].tolist()
