"""Wire codec tests: canonicality, round trips, error taxonomy.

Mirrors the reference's serialization tests (serialization_test.go:14-59)
and the non-canonical-scalar negative paths (api_test.go:39-122).
"""

import numpy as np
import pytest

from goethkzg_tpu import serialization as ser
from goethkzg_tpu.constants import (BYTES_PER_BLOB, BYTES_PER_CELL, R_MOD,
                                    SCALARS_PER_BLOB)
from goethkzg_tpu.errors import ErrNonCanonicalScalar
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.ops.field import limbs_to_int


def test_scalar_roundtrip_and_canonicality():
    for v in (0, 1, 12345, R_MOD - 1):
        b = v.to_bytes(32, "big")
        limbs = ser.deserialize_scalar(b)
        assert limbs_to_int(limbs) == v
        assert ser.serialize_fr_normal(limbs[None]) == b
    for bad in (R_MOD, R_MOD + 1, (1 << 256) - 1):
        with pytest.raises(ErrNonCanonicalScalar):
            ser.deserialize_scalar(bad.to_bytes(32, "big"))


def test_blob_roundtrip():
    rng = np.random.default_rng(0)
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(SCALARS_PER_BLOB)]
    blob = b"".join(s.to_bytes(32, "big") for s in scalars)
    limbs = ser.deserialize_blob(blob)
    assert limbs.shape == (SCALARS_PER_BLOB, 16)
    assert ser.serialize_fr_normal(limbs) == blob


def test_blob_length_and_nil_checks():
    with pytest.raises(ErrNonCanonicalScalar):
        ser.deserialize_blob(bytes(BYTES_PER_BLOB - 1))
    from goethkzg_tpu.errors import ErrDeserializeNilInput
    with pytest.raises(ErrDeserializeNilInput):
        ser.deserialize_blob(None)


def test_non_canonical_scalar_anywhere_in_blob_rejected():
    blob = bytearray(BYTES_PER_BLOB)
    bad = R_MOD.to_bytes(32, "big")  # == modulus: non-canonical
    blob[32 * 100:32 * 101] = bad
    with pytest.raises(ErrNonCanonicalScalar):
        ser.deserialize_blob(bytes(blob))


def test_cell_roundtrip():
    cell = bytes(BYTES_PER_CELL)
    limbs = ser.deserialize_cell(cell)
    assert ser.serialize_fr_normal(limbs) == cell


def test_g1_roundtrip_and_infinity():
    g = gc.g1_generator()
    assert ser.deserialize_g1(ser.serialize_g1(g)) == g
    inf = bytes([0xC0] + [0] * 47)
    assert ser.deserialize_g1(inf) is None
    assert ser.serialize_g1(None) == inf


def test_g1_malformed_rejected():
    from goethkzg_tpu.golden.curve import DeserializationError
    with pytest.raises(DeserializationError):
        ser.deserialize_g1(bytes(48))          # no compression bit
    bad = bytearray(ser.serialize_g1(gc.g1_generator()))
    bad[47] ^= 1                               # not on curve
    with pytest.raises(DeserializationError):
        ser.deserialize_g1(bytes(bad))


def test_g1_wrong_length_rejected():
    """Wire points must be exactly 48 bytes (reference: the [48]byte type
    of serialization.go:56-95 makes this structural; spec vector
    compute_blob_kzg_proof_case_invalid_commitment_d070689c sends 49)."""
    from goethkzg_tpu.golden.curve import DeserializationError
    g = ser.serialize_g1(gc.g1_generator())
    for bad in (g + b"\x00", g[:-1], b"", g * 2):
        with pytest.raises(DeserializationError):
            ser.deserialize_g1(bad)
        with pytest.raises(DeserializationError):
            ser.deserialize_g1_batch([g, bad])
