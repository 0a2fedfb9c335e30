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
        # unconditional: the Makefile dependency makes this a no-op when the
        # .so is newer than the sources, and a stale .so (e.g. from a source
        # edit) is silently wrong for the canonicality checks otherwise
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=300)
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
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.kzg_g1_decompress_batch.restype = ctypes.c_int
        lib.kzg_g1_decompress_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, u64p, u8p]
        lib.kzg_g1_compress_batch.restype = None
        lib.kzg_g1_compress_batch.argtypes = [
            u64p, u8p, ctypes.c_int64, u8p]
        lib.kzg_g1_subgroup_check_batch.restype = ctypes.c_int
        lib.kzg_g1_subgroup_check_batch.argtypes = [u64p, u8p, ctypes.c_int64]
        lib.kzg_g1_add.restype = None
        lib.kzg_g1_add.argtypes = [u64p, ctypes.c_uint8, u64p,
                                   ctypes.c_uint8, u64p, u8p]
        lib.kzg_g1_scalar_mul.restype = None
        lib.kzg_g1_scalar_mul.argtypes = [u64p, ctypes.c_uint8, u64p,
                                          u64p, u8p]
        lib.kzg_g1_lincomb.restype = None
        lib.kzg_g1_lincomb.argtypes = [u64p, u8p, u64p, ctypes.c_int64,
                                       u64p, u8p]
        lib.kzg_g2_add.restype = None
        lib.kzg_g2_add.argtypes = [u64p, ctypes.c_uint8, u64p,
                                   ctypes.c_uint8, u64p, u8p]
        lib.kzg_g2_scalar_mul.restype = None
        lib.kzg_g2_scalar_mul.argtypes = [u64p, ctypes.c_uint8, u64p,
                                          u64p, u8p]
        lib.kzg_g2_neg.restype = None
        lib.kzg_g2_neg.argtypes = [u64p, ctypes.c_uint8, u64p, u8p]
        lib.kzg_pairing_check.restype = ctypes.c_int
        lib.kzg_pairing_check.argtypes = [u64p, u8p, u64p, u8p,
                                          ctypes.c_int64]
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


# ---------------------------------------------------------------------------
# BLS12-381 host tier (native/bls_native.cpp): conversions between golden
# affine int tuples and the 6x64-bit little-endian word ABI.
# ---------------------------------------------------------------------------
def _fp_to_words(x: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(48, "little"), dtype=np.uint64)


def _words_to_fp(w) -> int:
    return int.from_bytes(np.ascontiguousarray(w, dtype=np.uint64).tobytes(),
                          "little")


def _g1_to_words(points):
    """golden tuples/None -> ([n, 12] u64 words, [n] u8 inf)."""
    n = len(points)
    xy = np.zeros((n, 12), dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    for i, p in enumerate(points):
        if p is None:
            inf[i] = 1
        else:
            xy[i, :6] = _fp_to_words(p[0])
            xy[i, 6:] = _fp_to_words(p[1])
    return xy, inf


def _words_to_g1(xy, inf):
    if inf:
        return None
    return (_words_to_fp(xy[:6]), _words_to_fp(xy[6:]))


def _g2_to_words(points):
    n = len(points)
    xy = np.zeros((n, 24), dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    for i, p in enumerate(points):
        if p is None:
            inf[i] = 1
        else:
            (x0, x1), (y0, y1) = p
            xy[i, 0:6] = _fp_to_words(x0)
            xy[i, 6:12] = _fp_to_words(x1)
            xy[i, 12:18] = _fp_to_words(y0)
            xy[i, 18:24] = _fp_to_words(y1)
    return xy, inf


def _words_to_g2(xy, inf):
    if inf:
        return None
    return ((_words_to_fp(xy[0:6]), _words_to_fp(xy[6:12])),
            (_words_to_fp(xy[12:18]), _words_to_fp(xy[18:24])))


def _fr_to_words(k: int) -> np.ndarray:
    return np.frombuffer(int(k).to_bytes(32, "little"), dtype=np.uint64)


def g1_decompress_batch(data: bytes, count: int, subgroup_check: bool = True):
    """count*48 compressed bytes -> (xy words [n,12], inf [n]) or None.

    Raises ValueError (with the index) on the first invalid point.
    """
    lib = _load()
    if lib is None:
        return None
    xy = np.empty((count, 12), dtype=np.uint64)
    inf = np.empty(count, dtype=np.uint8)
    rc = lib.kzg_g1_decompress_batch(bytes(data), count,
                                     1 if subgroup_check else 0, xy, inf)
    if rc != 0:
        raise ValueError(f"invalid G1 point at index {-1 - rc}")
    return xy, inf


def g1_decompress_batch_golden(data: bytes, count: int,
                               subgroup_check: bool = True):
    """Same, returning a list of golden affine tuples (None = infinity)."""
    out = g1_decompress_batch(data, count, subgroup_check)
    if out is None:
        return None
    xy, inf = out
    return [_words_to_g1(xy[i], inf[i]) for i in range(count)]


def g1_compress_batch(points) -> bytes | None:
    """List of golden tuples/None -> concatenated 48-byte encodings."""
    lib = _load()
    if lib is None:
        return None
    xy, inf = _g1_to_words(points)
    out = np.empty(len(points) * 48, dtype=np.uint8)
    lib.kzg_g1_compress_batch(xy, inf, len(points), out)
    return out.tobytes()


def g1_compress_words(xy: np.ndarray, inf: np.ndarray) -> bytes | None:
    """[n, 12] u64 normal words + [n] inf mask -> concatenated bytes."""
    lib = _load()
    if lib is None:
        return None
    xy = np.ascontiguousarray(xy, dtype=np.uint64)
    inf = np.ascontiguousarray(inf, dtype=np.uint8)
    out = np.empty(xy.shape[0] * 48, dtype=np.uint8)
    lib.kzg_g1_compress_batch(xy, inf, xy.shape[0], out)
    return out.tobytes()


def g1_add(p, q):
    lib = _load()
    if lib is None:
        return None
    (pw, pi), (qw, qi) = _g1_to_words([p]), _g1_to_words([q])
    out = np.empty(12, dtype=np.uint64)
    oinf = np.empty(1, dtype=np.uint8)
    lib.kzg_g1_add(pw[0], int(pi[0]), qw[0], int(qi[0]), out, oinf)
    return (_words_to_g1(out, oinf[0]),)


def g1_scalar_mul(p, k: int):
    lib = _load()
    if lib is None:
        return None
    if p is None or k == 0:
        return (None,)  # sentinel wrapper: distinguishes from "unavailable"
    pw, pi = _g1_to_words([p])
    out = np.empty(12, dtype=np.uint64)
    oinf = np.empty(1, dtype=np.uint8)
    lib.kzg_g1_scalar_mul(pw[0], int(pi[0]), _fr_to_words(k), out, oinf)
    return (_words_to_g1(out, oinf[0]),)


def g1_lincomb(points, scalars) -> object:
    """sum_i [k_i] P_i over golden tuples; returns tuple|None, or the string
    'unavailable' when the native library is missing."""
    lib = _load()
    if lib is None:
        return "unavailable"
    xy, inf = _g1_to_words(points)
    ks = np.zeros((len(points), 4), dtype=np.uint64)
    for i, k in enumerate(scalars):
        ks[i] = _fr_to_words(k)
    out = np.empty(12, dtype=np.uint64)
    oinf = np.empty(1, dtype=np.uint8)
    lib.kzg_g1_lincomb(xy, inf, ks, len(points), out, oinf)
    return _words_to_g1(out, oinf[0])


def g2_add(p, q):
    lib = _load()
    if lib is None:
        return None
    (pw, pi), (qw, qi) = _g2_to_words([p]), _g2_to_words([q])
    out = np.empty(24, dtype=np.uint64)
    oinf = np.empty(1, dtype=np.uint8)
    lib.kzg_g2_add(pw[0], int(pi[0]), qw[0], int(qi[0]), out, oinf)
    return (_words_to_g2(out, oinf[0]),)


def g2_scalar_mul(p, k: int):
    lib = _load()
    if lib is None:
        return None
    if p is None or k == 0:
        return (None,)
    pw, pi = _g2_to_words([p])
    out = np.empty(24, dtype=np.uint64)
    oinf = np.empty(1, dtype=np.uint8)
    lib.kzg_g2_scalar_mul(pw[0], int(pi[0]), _fr_to_words(k), out, oinf)
    return (_words_to_g2(out, oinf[0]),)


def pairing_check(pairs) -> bool | None:
    """prod e(P_i, Q_i) == 1 over golden affine pairs; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    g1s = [p for p, _ in pairs]
    g2s = [q for _, q in pairs]
    xy1, inf1 = _g1_to_words(g1s)
    xy2, inf2 = _g2_to_words(g2s)
    return bool(lib.kzg_pairing_check(xy1, inf1, xy2, inf2, len(pairs)))
