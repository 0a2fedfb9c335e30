"""Differential tests: native C++ BLS tier vs the pure-Python golden model.

Mirrors the reference's trust boundary for gnark-crypto (reference:
readme.md:41-44 — group ops and pairing delegated to an audited native
tier): every native operation is pinned against the obviously-correct
golden implementation, including the adversarial cases the wire paths
rely on (non-subgroup points, malformed encodings, infinity handling).
"""

import random

import pytest

from goethkzg_tpu import hostcurve, native
from goethkzg_tpu.constants import G1_B, P_MOD, R_MOD
from goethkzg_tpu.golden import curve as gcurve
from goethkzg_tpu.golden import field as gf
from goethkzg_tpu.golden import pairing as gpairing

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

G1 = gcurve.g1_generator()
G2 = gcurve.g2_generator()
rng = random.Random(0xb15)


def rand_g1():
    return gcurve.g1_scalar_mul(G1, rng.randrange(1, R_MOD))


def rand_g2():
    return gcurve.g2_scalar_mul(G2, rng.randrange(1, R_MOD))


def non_subgroup_point():
    """A point on E(Fp) outside G1 (order divisible by the cofactor)."""
    x = 5
    while True:
        y = gf.fp_sqrt((x * x * x + G1_B) % P_MOD)
        if y is not None and not gcurve.g1_in_subgroup((x, y)):
            return (x, y)
        x += 1


class TestG1Ops:
    def test_add_random(self):
        for _ in range(5):
            p, q = rand_g1(), rand_g1()
            assert hostcurve.g1_add(p, q) == gcurve.g1_add(p, q)

    def test_add_edges(self):
        p = rand_g1()
        assert hostcurve.g1_add(p, p) == gcurve.g1_add(p, p)      # doubling
        assert hostcurve.g1_add(p, gcurve.g1_neg(p)) is None      # inverse
        assert hostcurve.g1_add(p, None) == p                     # identity
        assert hostcurve.g1_add(None, None) is None

    def test_scalar_mul(self):
        p = rand_g1()
        for k in [0, 1, 2, 3, R_MOD - 1, R_MOD, rng.randrange(R_MOD)]:
            assert hostcurve.g1_scalar_mul(p, k) == gcurve.g1_scalar_mul(p, k)

    def test_lincomb(self):
        pts = [rand_g1() for _ in range(7)] + [None]
        ks = [rng.randrange(R_MOD) for _ in range(8)]
        want = None
        for p, k in zip(pts, ks):
            want = gcurve.g1_add(want, gcurve.g1_scalar_mul(p, k))
        assert hostcurve.g1_lincomb(pts, ks) == want


class TestG2Ops:
    def test_add_and_mul(self):
        p, q = rand_g2(), rand_g2()
        assert hostcurve.g2_add(p, q) == gcurve.g2_add(p, q)
        assert hostcurve.g2_add(p, p) == gcurve.g2_add(p, p)
        k = rng.randrange(R_MOD)
        assert hostcurve.g2_scalar_mul(p, k) == gcurve.g2_scalar_mul(p, k)


class TestCodec:
    def test_roundtrip_matches_golden_bytes(self):
        pts = [rand_g1() for _ in range(6)] + [None]
        enc = hostcurve.g1_compress_many(pts)
        assert enc == [gcurve.g1_compress(p) for p in pts]
        dec = hostcurve.g1_decompress_many(enc)
        assert dec == pts

    def test_both_y_signs(self):
        p = rand_g1()
        q = gcurve.g1_neg(p)
        for pt in (p, q):
            enc = hostcurve.g1_compress(pt)
            assert hostcurve.g1_decompress(enc) == pt

    def test_rejects_non_subgroup(self):
        bad = non_subgroup_point()
        enc = gcurve.g1_compress(bad)
        with pytest.raises(gcurve.DeserializationError):
            hostcurve.g1_decompress(enc, subgroup_check=True)
        # trusted-setup semantics skip the subgroup check
        assert hostcurve.g1_decompress(enc, subgroup_check=False) == bad

    def test_rejects_malformed(self):
        p = rand_g1()
        good = bytearray(hostcurve.g1_compress(p))
        # uncompressed flag
        bad = bytes([good[0] & ~0x80]) + bytes(good[1:])
        with pytest.raises(gcurve.DeserializationError):
            hostcurve.g1_decompress(bad)
        # non-canonical x (x + p)
        xp = int.from_bytes(bytes([good[0] & 0x1F]) + bytes(good[1:]), "big")
        overp = (xp + P_MOD).to_bytes(48, "big")
        bad2 = bytes([overp[0] | (good[0] & 0xE0)]) + overp[1:]
        with pytest.raises(gcurve.DeserializationError):
            hostcurve.g1_decompress(bad2)
        # malformed infinity (nonzero payload)
        inf = bytearray(gcurve.g1_compress(None))
        inf[17] = 1
        with pytest.raises(gcurve.DeserializationError):
            hostcurve.g1_decompress(bytes(inf))
        # x not on curve: find x whose x^3+4 is a non-residue
        x = 1
        while gf.fp_sqrt((x * x * x + G1_B) % P_MOD) is not None:
            x += 1
        nc = bytearray(x.to_bytes(48, "big"))
        nc[0] |= 0x80
        with pytest.raises(gcurve.DeserializationError):
            hostcurve.g1_decompress(bytes(nc))

    def test_error_reports_index(self):
        pts = [rand_g1(), non_subgroup_point()]
        enc = [gcurve.g1_compress(p) for p in pts]
        with pytest.raises(gcurve.DeserializationError, match="index 1"):
            hostcurve.g1_decompress_many(enc)


class TestSubgroupCheckEndomorphism:
    """The native check uses the GLV endomorphism (phi(P) == -[z^2]P);
    pin it against the definitional mul-by-r oracle on both sides."""

    def test_accepts_subgroup_points(self):
        for _ in range(4):
            p = rand_g1()
            enc = gcurve.g1_compress(p)
            assert hostcurve.g1_decompress(enc, subgroup_check=True) == p

    def test_rejects_cofactor_points(self):
        found = 0
        x = 100
        while found < 4:
            x += 1
            y = gf.fp_sqrt((x * x * x + G1_B) % P_MOD)
            if y is None:
                continue
            pt = (x, y)
            if gcurve.g1_in_subgroup(pt):
                continue
            found += 1
            with pytest.raises(gcurve.DeserializationError):
                hostcurve.g1_decompress(gcurve.g1_compress(pt),
                                        subgroup_check=True)


class TestPairing:
    def test_bilinear_identity(self):
        a, b = rng.randrange(1, R_MOD), rng.randrange(1, R_MOD)
        pa = gcurve.g1_scalar_mul(G1, a)
        qb = gcurve.g2_scalar_mul(G2, b)
        nab = gcurve.g1_neg(gcurve.g1_scalar_mul(G1, a * b % R_MOD))
        assert hostcurve.pairing_check([(pa, qb), (nab, G2)])

    def test_failure_detected(self):
        a = rng.randrange(2, R_MOD)
        pa = gcurve.g1_scalar_mul(G1, a)
        assert not hostcurve.pairing_check([(pa, G2), (gcurve.g1_neg(G1), G2)])

    def test_infinity_pairs_are_identity(self):
        assert hostcurve.pairing_check([])
        assert hostcurve.pairing_check([(None, G2), (G1, None)])

    def test_matches_golden(self):
        a, b = rng.randrange(1, R_MOD), rng.randrange(1, R_MOD)
        pairs = [(gcurve.g1_scalar_mul(G1, a), gcurve.g2_scalar_mul(G2, b)),
                 (gcurve.g1_neg(gcurve.g1_scalar_mul(G1, b)),
                  gcurve.g2_scalar_mul(G2, a))]
        assert (hostcurve.pairing_check(pairs)
                == gpairing.pairing_check(pairs))
        bad = [(G1, G2), (G1, G2)]
        assert (hostcurve.pairing_check(bad)
                == gpairing.pairing_check(bad))
