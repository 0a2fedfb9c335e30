"""Wire (de)serialization: blobs, cells, scalars, compressed G1 points.

Host-side numpy codecs feeding the device limb representation.  Semantics
mirror the reference exactly (reference: serialization.go):

* scalars are 32-byte big-endian and must be canonical (< r) — else
  ErrNonCanonicalScalar (serialization.go:134-159);
* G1 wire points get on-curve + subgroup checks (serialization.go:102-115);
* blobs are 4096 scalars, cells are 64 scalars.
"""

import numpy as np

from . import hostcurve, native
from .constants import (BYTES_PER_BLOB, BYTES_PER_CELL, R_MOD,
                        SCALARS_PER_BLOB, SCALARS_PER_CELL,
                        SERIALIZED_SCALAR_SIZE)
from .errors import ErrNonCanonicalScalar
from .golden import curve as gcurve
from .ops.field import fr_spec

_R_WORDS_BE = np.array([(R_MOD >> (16 * (15 - i))) & 0xFFFF for i in range(16)],
                       dtype=np.uint32)


def _bytes_to_fr_limbs(data: bytes, count: int) -> np.ndarray:
    """BE 32-byte scalars -> [count, 16] LE 16-bit limbs, with canonical check."""
    try:
        out = native.scalars_to_limbs(bytes(data), count)
    except ValueError as e:
        raise ErrNonCanonicalScalar(str(e)) from None
    if out is not None:
        return out
    arr = np.frombuffer(data, dtype=np.uint8).reshape(count, SERIALIZED_SCALAR_SIZE)
    words_be = (arr[:, 0::2].astype(np.uint32) << 8) | arr[:, 1::2]  # [count, 16] BE
    # canonical (strictly less than r): lexicographic compare, MSW first
    lt = np.zeros(count, dtype=bool)
    eq = np.ones(count, dtype=bool)
    for k in range(16):
        lt |= eq & (words_be[:, k] < _R_WORDS_BE[k])
        eq &= words_be[:, k] == _R_WORDS_BE[k]
    if not lt.all():
        raise ErrNonCanonicalScalar()
    return words_be[:, ::-1].copy()  # little-endian limb order


def _fr_limbs_to_bytes(limbs: np.ndarray) -> bytes:
    """[N, 16] LE 16-bit limbs (normal form) -> concatenated BE 32-byte scalars."""
    limbs = np.asarray(limbs, dtype=np.uint32)
    out = native.limbs_to_scalars(limbs)
    if out is not None:
        return out
    words_be = limbs[:, ::-1]
    out = np.empty((limbs.shape[0], 32), dtype=np.uint8)
    out[:, 0::2] = (words_be >> 8).astype(np.uint8)
    out[:, 1::2] = (words_be & 0xFF).astype(np.uint8)
    return out.tobytes()


def validate_blob_bytes(blob: bytes) -> np.ndarray:
    """Blob -> u8[131072] with the canonicality CHECK only — the limb
    unpack happens ON DEVICE (api._blob_u8_to_limbs).  Uploading raw
    bytes instead of unpacked u32 limbs HALVES the host->device transfer,
    which at the tunnel's measured ~40 MB/s is the single largest term of
    the batched verify/commit paths.  Error taxonomy identical to
    deserialize_blob (reference: serialization.go:134)."""
    if blob is None:
        from .errors import ErrDeserializeNilInput
        raise ErrDeserializeNilInput()
    if len(blob) != BYTES_PER_BLOB:
        raise ErrNonCanonicalScalar(f"blob must be {BYTES_PER_BLOB} bytes")
    arr = np.frombuffer(bytes(blob), dtype=np.uint8)
    words_be = ((arr.reshape(SCALARS_PER_BLOB, 32)[:, 0::2].astype(np.uint32)
                 << 8) | arr.reshape(SCALARS_PER_BLOB, 32)[:, 1::2])
    lt = np.zeros(SCALARS_PER_BLOB, dtype=bool)
    eq = np.ones(SCALARS_PER_BLOB, dtype=bool)
    for k in range(16):
        lt |= eq & (words_be[:, k] < _R_WORDS_BE[k])
        eq &= words_be[:, k] == _R_WORDS_BE[k]
    if not lt.all():
        raise ErrNonCanonicalScalar()
    return arr


def deserialize_blob(blob: bytes) -> np.ndarray:
    """Blob -> [4096, 16] limb array (normal form). reference: serialization.go:134."""
    if blob is None:
        from .errors import ErrDeserializeNilInput
        raise ErrDeserializeNilInput()
    if len(blob) != BYTES_PER_BLOB:
        raise ErrNonCanonicalScalar(f"blob must be {BYTES_PER_BLOB} bytes")
    return _bytes_to_fr_limbs(blob, SCALARS_PER_BLOB)


def deserialize_cell(cell: bytes) -> np.ndarray:
    if cell is None:
        from .errors import ErrDeserializeNilInput
        raise ErrDeserializeNilInput()
    if len(cell) != BYTES_PER_CELL:
        raise ErrNonCanonicalScalar(f"cell must be {BYTES_PER_CELL} bytes")
    return _bytes_to_fr_limbs(cell, SCALARS_PER_CELL)


def deserialize_scalar(data: bytes) -> np.ndarray:
    if len(data) != SERIALIZED_SCALAR_SIZE:
        raise ErrNonCanonicalScalar("scalar must be 32 bytes")
    return _bytes_to_fr_limbs(data, 1)[0]


def serialize_scalar_int(v: int) -> bytes:
    return int(v % R_MOD).to_bytes(32, "big")


def serialize_fr_normal(limbs: np.ndarray) -> bytes:
    """Device normal-form limbs [..., 16] -> bytes (one or many scalars)."""
    arr = np.asarray(limbs, dtype=np.uint32)
    flat = arr.reshape(-1, 16)
    return _fr_limbs_to_bytes(flat)


def deserialize_g1(data: bytes, subgroup_check: bool = True):
    """48-byte compressed G1 -> golden affine tuple (or None for infinity).

    Raises golden.curve.DeserializationError on malformed input.
    reference: serialization.go:108 (gnark SetBytes semantics).
    Native C++ fast path (sqrt + endomorphism subgroup check) with the
    golden fallback — see hostcurve.py.
    """
    return hostcurve.g1_decompress(bytes(data), subgroup_check=subgroup_check)


def deserialize_g1_batch(datas, subgroup_check: bool = True):
    """Batched wire-point decode: one native call for a list of encodings."""
    return hostcurve.g1_decompress_many(datas, subgroup_check=subgroup_check)


def serialize_g1(pt) -> bytes:
    return hostcurve.g1_compress(pt)


def g1_points_to_device_arrays(points):
    """List of golden affine points/None -> (x, y, inf) numpy limb arrays."""
    fp = __import__("goethkzg_tpu.ops.field", fromlist=["fp_spec"]).fp_spec()
    xs = np.stack([fp.from_int(p[0]) if p else np.zeros(fp.n, np.uint32)
                   for p in points])
    ys = np.stack([fp.from_int(p[1]) if p else np.zeros(fp.n, np.uint32)
                   for p in points])
    inf = np.array([p is None for p in points])
    return xs, ys, inf
