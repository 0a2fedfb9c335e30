"""Device G1 wire-point decompression (ops/decompress.py).

Tier 1 (always): vectorized wire-format parsing vs the golden parser's
error taxonomy; windowed exponentiation vs the bit-scan reference.
Tier 2 (heavy): the full device decode graph vs golden.g1_decompress —
coordinates bit-exact, on-curve / subgroup rejection, sign convention.
reference: serialization.go:102-115 (gnark SetBytes semantics).
"""

import numpy as np
import pytest

import goethkzg_tpu.golden.curve as gc
import goethkzg_tpu.golden.field as gf
from goethkzg_tpu.constants import G1_B, P_MOD
from goethkzg_tpu.ops import decompress as dec
from goethkzg_tpu.ops.field import fr_spec, fp_spec, pallas_disabled


# --------------------------------------------------------------- tier 1
def test_parse_valid_roundtrip():
    g = gc.g1_generator()
    p2 = gc.g1_add(g, g)
    x_limbs, sign, inf = dec.parse_g1_compressed_batch(
        [gc.g1_compress(g), gc.g1_compress(p2), gc.g1_compress(None)])
    assert [int(v) for v in inf] == [0, 0, 1]
    from goethkzg_tpu.ops.field import limbs_to_int
    assert limbs_to_int(x_limbs[0]) == g[0]
    assert limbs_to_int(x_limbs[1]) == p2[0]
    # sign bits match the golden encoder's lexicographic flag
    assert bool(sign[0]) == bool(gc.g1_compress(g)[0] & 0x20)


@pytest.mark.parametrize("data,msg", [
    (b"\x00" * 48, "compressed"),
    (bytes([0xC0]) + b"\x00" * 46 + b"\x01", "infinity"),
    (bytes([0xE0]) + b"\x00" * 47, "infinity"),       # extra flag bit set
    (b"\xbf" + b"\xff" * 47, "canonical"),    # x = 2^381 - 1 > p, no inf bit
    (b"\x80" + b"\x00" * 20, "48 bytes"),
    (None, "nil"),
])
def test_parse_error_taxonomy(data, msg):
    with pytest.raises(dec.G1DecompressError) as e:
        dec.parse_g1_compressed_batch([data])
    assert msg in str(e.value)


def test_parse_first_bad_index():
    g = gc.g1_compress(gc.g1_generator())
    with pytest.raises(dec.G1DecompressError) as e:
        dec.parse_g1_compressed_batch([g, g, b"\xff" * 48, b"\x00" * 48])
    assert e.value.index == 2


def test_pow_const_windowed_matches_bit_scan():
    fr = fr_spec()
    rng = np.random.default_rng(7)
    with pallas_disabled():
        a = fr.to_mont(np.stack([
            np.concatenate([rng.integers(0, 1 << 16, 15, dtype=np.uint32),
                            np.zeros(1, np.uint32)])
            for _ in range(4)]))
        for exp in (1, 2, 0x5BF, (1 << 255) // 7, fr.modulus - 2):
            ref = np.asarray(fr.pow_const(a, exp))
            win = np.asarray(fr.pow_const_windowed(a, exp))
            assert (ref == win).all(), exp


def test_calibrated_beta_is_cube_root():
    b = dec._calibrated_beta()
    assert b != 1 and pow(b, 3, P_MOD) == 1


# --------------------------------------------------------------- tier 2
def _on_curve_point_not_in_g1():
    x = 2
    while True:
        y = gf.fp_sqrt((x * x * x + G1_B) % P_MOD)
        if y is not None and not gc.g1_in_subgroup((x, y)):
            return (x, y)
        x += 1


@pytest.mark.heavy
def test_device_decode_differential():
    from goethkzg_tpu.ops.curve import CurveOps

    g = gc.g1_generator()
    pts = [g]
    for _ in range(2):
        pts.append(gc.g1_add(pts[-1], g))
    bad_sub = _on_curve_point_not_in_g1()
    x = 1
    while gf.fp_sqrt((x * x * x + G1_B) % P_MOD) is not None:
        x += 1
    not_on_curve = bytes([0x80 | (x >> 376)]) + x.to_bytes(48, "big")[1:]

    enc = ([gc.g1_compress(p) for p in pts]
           + [gc.g1_compress(None), gc.g1_compress(bad_sub), not_on_curve])
    F = fp_spec()
    d = dec.DeviceG1Decoder(CurveOps(F))

    xm, ym, inf, ok = d.decode(enc, subgroup_check=True)
    assert list(ok) == [True, True, True, True, False, False]
    assert [bool(v) for v in np.asarray(inf)] == [0, 0, 0, 1, 0, 0]
    for i, pt in enumerate(pts):
        assert (F.to_int(np.asarray(xm)[i]), F.to_int(np.asarray(ym)[i])) == pt

    # without the subgroup check the h-torsion point decodes to its coords
    xm, ym, inf, ok = d.decode(enc, subgroup_check=False)
    assert list(ok) == [True, True, True, True, True, False]
    assert (F.to_int(np.asarray(xm)[4]), F.to_int(np.asarray(ym)[4])) == bad_sub


@pytest.mark.heavy
def test_api_batch_verify_uses_device_decode(monkeypatch, ctx):
    """verify_blob_kzg_proof_batch end-to-end through the device decoder."""
    monkeypatch.setenv("GOETHKZG_DEVICE_DECODE", "1")
    rng = np.random.default_rng(3)
    from goethkzg_tpu.constants import R_MOD
    blobs = []
    for _ in range(2):
        vals = [int.from_bytes(rng.bytes(32), "big") % R_MOD
                for _ in range(4096)]
        blobs.append(b"".join(v.to_bytes(32, "big") for v in vals))
    comms = [ctx.blob_to_kzg_commitment(b) for b in blobs]
    proofs = [ctx.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, comms)]
    ctx.verify_blob_kzg_proof_batch(blobs, comms, proofs)   # should not raise

    from goethkzg_tpu.golden.curve import DeserializationError
    with pytest.raises(DeserializationError):
        ctx.verify_blob_kzg_proof_batch(blobs, [b"\xff" * 48, comms[1]], proofs)
