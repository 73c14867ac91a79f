"""ctypes binding for the native IO runtime (native/libmmrp_io.so).

The C++ library implements the DICOM decode -> window -> resize -> normalize
hot path with a persistent worker pool (native/mmrp_io.cpp); this module
loads it lazily and exposes numpy-facing wrappers. Callers fall back to the
pure-Python decoder (mmrp_tpu/data/dicom.py) when the library has not been
built — functionality is identical, only throughput differs.

Build: ``make -C native`` (g++ only; no external deps).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / "libmmrp_io.so"
_lib = None
_load_failed = False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.mmrp_preprocess.restype = ctypes.c_int
    lib.mmrp_preprocess.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.mmrp_preprocess_batch.restype = None
    lib.mmrp_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mmrp_dicom_dims.restype = ctypes.c_int
    lib.mmrp_dicom_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mmrp_decode_raw.restype = ctypes.c_int
    lib.mmrp_decode_raw.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


def preprocess(
    dicom_bytes: bytes,
    out_hw=(224, 224),
    mean: float = 0.5,
    std: float = 0.5,
    default_wc: float = 40.0,
    default_ww: float = 400.0,
) -> np.ndarray:
    """One DICOM blob -> (H, W) normalized float32. Raises on parse error."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    oh, ow = out_hw
    out = np.empty((oh, ow), dtype=np.float32)
    rc = lib.mmrp_preprocess(
        dicom_bytes, len(dicom_bytes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, mean, std, default_wc, default_ww,
    )
    if rc != 0:
        raise ValueError(f"native DICOM preprocess failed (code {rc})")
    return out


def preprocess_batch(
    blobs: Sequence[bytes],
    out_hw=(224, 224),
    mean: float = 0.5,
    std: float = 0.5,
    default_wc: float = 40.0,
    default_ww: float = 400.0,
) -> tuple:
    """N blobs -> ((N, H, W) float32, status (N,) int32) via the worker pool."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = len(blobs)
    oh, ow = out_hw
    out = np.empty((n, oh, ow), dtype=np.float32)
    status = np.empty(n, dtype=np.int32)
    buf_arr = (ctypes.c_char_p * n)(*blobs)
    len_arr = (ctypes.c_long * n)(*[len(b) for b in blobs])
    lib.mmrp_preprocess_batch(
        buf_arr, len_arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, mean, std, default_wc, default_ww,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status


def decode_raw(dicom_bytes: bytes) -> np.ndarray:
    """Decode + rescale only -> (rows, cols) float32."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    rows, cols = ctypes.c_int(), ctypes.c_int()
    rc = lib.mmrp_dicom_dims(dicom_bytes, len(dicom_bytes),
                             ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise ValueError("native DICOM parse failed")
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    rc = lib.mmrp_decode_raw(
        dicom_bytes, len(dicom_bytes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError("native DICOM decode failed")
    return out
