"""ctypes bindings for the native host runtime (native/kzg_native.cpp).

Builds the shared library on first use if g++ is available; every caller
falls back to the pure-numpy path when the library can't be built, so the
package works identically without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libkzg_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.kzg_scalars_to_limbs.restype = ctypes.c_int
        lib.kzg_scalars_to_limbs.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")]
        lib.kzg_limbs_to_scalars.restype = None
        lib.kzg_limbs_to_scalars.argtypes = [
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
        lib.kzg_compute_challenges.restype = None
        lib.kzg_compute_challenges.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def scalars_to_limbs(data: bytes, count: int):
    """BE 32-byte scalars -> [count, 16] LE limbs; None if unavailable.

    Raises ValueError on a non-canonical scalar (caller maps to the
    library error type).
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((count, 16), dtype=np.uint32)
    rc = lib.kzg_scalars_to_limbs(data, count, out)
    if rc != 0:
        raise ValueError(f"non-canonical scalar at index {-1 - rc}")
    return out


def limbs_to_scalars(limbs: np.ndarray) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    count = limbs.shape[0]
    out = np.empty(count * 32, dtype=np.uint8)
    lib.kzg_limbs_to_scalars(limbs, count, out)
    return out.tobytes()


def compute_challenges(dom_sep: bytes, poly_degree: int, blobs: bytes,
                       blob_len: int, comms: bytes, count: int):
    """Batched Fiat-Shamir digests [count, 32] bytes; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(count * 32, dtype=np.uint8)
    lib.kzg_compute_challenges(dom_sep, poly_degree, blobs, blob_len,
                               comms, count, out)
    return out.reshape(count, 32)
