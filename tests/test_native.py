"""Native C++ host runtime vs the pure-Python/numpy reference paths.

The native library (native/kzg_native.cpp via goethkzg_tpu/native.py) must
be bit-identical to the fallback: scalar codecs (canonicality included)
and the Fiat-Shamir challenge hash.
"""

import hashlib

import numpy as np
import pytest

from goethkzg_tpu import fiatshamir, native
from goethkzg_tpu.constants import (BYTES_PER_BLOB, DOM_SEP_PROTOCOL, R_MOD,
                                    SCALARS_PER_BLOB)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_scalar_codec_roundtrip_and_canonicality():
    vals = [0, 1, 2**255 % R_MOD, R_MOD - 1]
    data = b"".join(v.to_bytes(32, "big") for v in vals)
    limbs = native.scalars_to_limbs(data, len(vals))
    for i, v in enumerate(vals):
        assert sum(int(l) << (16 * k) for k, l in enumerate(limbs[i])) == v
    assert native.limbs_to_scalars(limbs) == data

    bad = data + R_MOD.to_bytes(32, "big")
    with pytest.raises(ValueError, match="index 4"):
        native.scalars_to_limbs(bad, len(vals) + 1)


def test_challenges_match_hashlib():
    rng = np.random.default_rng(1)
    blobs = [rng.integers(0, 256, BYTES_PER_BLOB, dtype=np.uint8).tobytes()
             for _ in range(3)]
    comms = [rng.integers(0, 256, 48, dtype=np.uint8).tobytes()
             for _ in range(3)]
    digests = native.compute_challenges(
        DOM_SEP_PROTOCOL, SCALARS_PER_BLOB, b"".join(blobs), BYTES_PER_BLOB,
        b"".join(comms), 3)
    got = np.stack([
        np.array([(int.from_bytes(digests[i].tobytes(), "big") % R_MOD)
                  >> (16 * k) & 0xFFFF for k in range(16)], dtype=np.uint32)
        for i in range(3)])
    # the public batch path must agree
    assert np.array_equal(got, fiatshamir.compute_challenges_batch(blobs, comms))
    for i in range(3):
        h = hashlib.sha256()
        h.update(DOM_SEP_PROTOCOL)
        h.update(SCALARS_PER_BLOB.to_bytes(16, "big"))
        h.update(blobs[i])
        h.update(comms[i])
        want = int.from_bytes(h.digest(), "big") % R_MOD
        assert sum(int(l) << (16 * k) for k, l in enumerate(got[i])) == want


def test_blob_deserialize_native_equals_numpy(monkeypatch):
    from goethkzg_tpu import serialization as ser
    rng = np.random.default_rng(2)
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(SCALARS_PER_BLOB)]
    blob = b"".join(s.to_bytes(32, "big") for s in scalars)
    fast = ser.deserialize_blob(blob)
    monkeypatch.setattr(native, "scalars_to_limbs", lambda *a: None)
    slow = ser.deserialize_blob(blob)
    assert np.array_equal(fast, slow)
