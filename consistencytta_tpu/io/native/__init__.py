"""Native (C) host-side audio kernels, loaded via ctypes.

Compiled on first use with the system compiler (cc -O3 -shared -fPIC);
falls back to the numpy/JAX implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "resample.c")
    # build outside the package tree: a .so inside would be picked up by
    # package walkers as a broken extension module
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "consistencytta_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libresample.so")
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(
            lib_path
        ) < os.path.getmtime(src):
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", src, "-o", lib_path],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.resample_polyphase_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.resample_polyphase_f32.restype = None
        lib.normalize_wav_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64
        ]
        lib.normalize_wav_f32.restype = None
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build_and_load()
        _TRIED = True
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_native(wav: np.ndarray, orig_freq: int, new_freq: int) -> Optional[np.ndarray]:
    """Native polyphase resample of a 1-D float32 waveform; None if the
    native library is unavailable. Matches ops.resample.resample."""
    lib = get_lib()
    if lib is None:
        return None
    import math

    from consistencytta_tpu.ops.resample import _sinc_resample_kernel

    kernel, width, orig, new = _sinc_resample_kernel(orig_freq, new_freq)
    kernel2d = np.ascontiguousarray(kernel[:, 0, :], np.float32)  # [new, K]
    x = np.ascontiguousarray(wav, np.float32)
    n = len(x)
    padded = np.zeros(n + width + width + orig, np.float32)
    padded[width : width + n] = x
    n_out = int(math.ceil(new * n / orig))
    out = np.empty(n_out, np.float32)
    lib.resample_polyphase_f32(
        _fptr(padded), len(padded), _fptr(kernel2d), kernel2d.shape[0],
        kernel2d.shape[1], orig, _fptr(out), n_out,
    )
    return out


def normalize_native(wav: np.ndarray) -> Optional[np.ndarray]:
    """In-place-equivalent mean-center + peak-normalize to 0.5; None if
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(wav, np.float32).copy()
    lib.normalize_wav_f32(_fptr(x), len(x))
    return x
