"""ctypes bindings for the native host MAS kernel (``native/mas.cpp``).

Host-side counterpart of the on-device ``ops/mas.py`` — used by offline
alignment tooling and as an independent oracle in tests (the role the
reference's Cython ``monotonic_align`` kernel played,
``Grad-TTS_TF/model/monotonic_align/``). Builds on demand with ``make``;
falls back cleanly when no toolchain is available (``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmas.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mas_batch.argtypes = [f32p, f32p, i32p, i32p,
                              ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.mas_batch.restype = None
    lib.mas_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return lib.mas_num_threads() if lib else 0


def b_mas_native(log_attn: np.ndarray, in_lens, out_lens) -> np.ndarray:
    """Batched width-1 MAS on the host (OpenMP over the batch).

    log_attn: [B, T_mel, T_text] float32 → one-hot path, same shape.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native MAS kernel unavailable (no g++/make?)")
    log_attn = np.ascontiguousarray(log_attn, np.float32)
    B, T_mel, T_text = log_attn.shape
    path = np.zeros_like(log_attn)
    lib.mas_batch(log_attn, path,
                  np.ascontiguousarray(in_lens, np.int32),
                  np.ascontiguousarray(out_lens, np.int32),
                  B, T_mel, T_text)
    return path
