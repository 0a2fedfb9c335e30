"""Host-side curve operations: native C++ fast path, golden-Python fallback.

The latency-critical per-call scalar work of the verify paths — wire-point
decompression (sqrt + subgroup check), the fold tail's few G1/G2 ops, and
the final PairingCheck — runs in native/bls_native.cpp when the toolchain
is available and falls back to the bit-identical golden model otherwise.
This is the TPU build's analog of the reference's gnark assembly tier
(reference: serialization.go:102-115, internal/kzg/kzg_verify.go:74-91).

All points are golden affine tuples: G1 = (x, y) ints, None = infinity;
G2 = ((x0, x1), (y0, y1)).
"""

from . import native
from .golden import curve as gcurve
from .golden import pairing as gpairing
from .golden.curve import DeserializationError


def g1_decompress(data: bytes, subgroup_check: bool = True):
    if len(data) != 48:
        # strict wire length (reference: serialization.go:102-115 — the
        # 48-byte array type makes this structural in Go; here it's a check)
        raise DeserializationError("G1 point must be 48 bytes")
    try:
        pts = native.g1_decompress_batch_golden(bytes(data), 1, subgroup_check)
    except ValueError as e:
        raise DeserializationError(str(e)) from None
    if pts is None:
        return gcurve.g1_decompress(data, subgroup_check=subgroup_check)
    return pts[0]


def g1_decompress_many(datas, subgroup_check: bool = True):
    """Batched decompression of a list of 48-byte encodings."""
    datas = [bytes(d) for d in datas]
    for d in datas:
        if len(d) != 48:
            raise DeserializationError("G1 point must be 48 bytes")
    try:
        pts = native.g1_decompress_batch_golden(
            b"".join(datas), len(datas), subgroup_check)
    except ValueError as e:
        raise DeserializationError(str(e)) from None
    if pts is None:
        return [gcurve.g1_decompress(d, subgroup_check=subgroup_check)
                for d in datas]
    return pts


def g1_compress(p) -> bytes:
    out = native.g1_compress_batch([p])
    if out is None:
        return gcurve.g1_compress(p)
    return out


def g1_compress_many(points):
    out = native.g1_compress_batch(points)
    if out is None:
        return [gcurve.g1_compress(p) for p in points]
    return [out[i * 48:(i + 1) * 48] for i in range(len(points))]


def g1_compress_normal_limbs(limbs, inf):
    """[n, 24] uint16-valued normal-form limb array + inf mask -> bytes list.

    The zero-Python-per-point path for device outputs: 16-bit limbs pack
    straight into the native ABI's little-endian u64 words.
    """
    import numpy as np
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32).astype("<u2")
    words = np.frombuffer(limbs.tobytes(), dtype=np.uint64).reshape(-1, 6)
    n = words.shape[0] // 2
    xy = words.reshape(n, 12)
    out = native.g1_compress_words(xy, np.asarray(inf, dtype=np.uint8))
    if out is None:
        from .ops.field import limbs_to_int
        pts = [None if inf[i] else
               (limbs_to_int(limbs[2 * i]), limbs_to_int(limbs[2 * i + 1]))
               for i in range(n)]
        return [gcurve.g1_compress(p) for p in pts]
    return [out[i * 48:(i + 1) * 48] for i in range(n)]


def g1_add(p, q):
    out = native.g1_add(p, q)
    if out is None:
        return gcurve.g1_add(p, q)
    return out[0]


def g1_neg(p):
    return gcurve.g1_neg(p)


def g1_scalar_mul(p, k: int):
    out = native.g1_scalar_mul(p, k)
    if out is None:
        return gcurve.g1_scalar_mul(p, k)
    return out[0]


def g1_lincomb(points, scalars):
    """sum_i [k_i] P_i — the host fold tail for small batches."""
    out = native.g1_lincomb(points, scalars)
    if out == "unavailable":
        acc = None
        for p, k in zip(points, scalars):
            acc = gcurve.g1_add(acc, gcurve.g1_scalar_mul(p, k))
        return acc
    return out


def g2_add(p, q):
    out = native.g2_add(p, q)
    if out is None:
        return gcurve.g2_add(p, q)
    return out[0]


def g2_neg(p):
    return gcurve.g2_neg(p)


def g2_scalar_mul(p, k: int):
    out = native.g2_scalar_mul(p, k)
    if out is None:
        return gcurve.g2_scalar_mul(p, k)
    return out[0]


def pairing_check(pairs) -> bool:
    """prod e(P_i, Q_i) == 1; native Miller loops + final exp (~20 ms)
    with the pure-Python golden fallback (~330 ms)."""
    out = native.pairing_check(pairs)
    if out is None:
        return gpairing.pairing_check(
            [(p, q) for p, q in pairs if p is not None and q is not None])
    return out
