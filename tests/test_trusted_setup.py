"""Trusted-setup well-formedness checker (reference: trusted_setup_test.go:10-17).

Positive: a small insecure-SRS setup dict passes.  Negative: corrupting one
G1 point to an on-curve-but-out-of-subgroup point, or one G2 point to a
non-canonical encoding, must raise.
"""

import pytest

from goethkzg_tpu.golden import curve as gcurve
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.trusted_setup import check_trusted_setup_is_well_formed
from tests.test_native_bls import non_subgroup_point


@pytest.fixture(scope="module")
def small_setup():
    mono, lag, g2s = insecure_srs(8, secret=1234)
    enc1 = lambda pts: ["0x" + gcurve.g1_compress(p).hex() for p in pts]
    return {
        "g1_monomial": enc1(mono),
        "g1_lagrange": enc1(lag),
        "g2_monomial": ["0x" + gcurve.g2_compress(p).hex() for p in g2s],
    }


def test_valid_setup_passes(small_setup):
    check_trusted_setup_is_well_formed(small_setup)


def test_non_subgroup_g1_rejected(small_setup):
    bad = dict(small_setup)
    bad["g1_lagrange"] = list(bad["g1_lagrange"])
    bad["g1_lagrange"][3] = "0x" + gcurve.g1_compress(non_subgroup_point()).hex()
    with pytest.raises(Exception):
        check_trusted_setup_is_well_formed(bad)


def test_malformed_g2_rejected(small_setup):
    bad = dict(small_setup)
    bad["g2_monomial"] = list(bad["g2_monomial"])
    raw = bytearray.fromhex(bad["g2_monomial"][1][2:])
    raw[0] &= 0x1F                      # clear the compression flag bits
    bad["g2_monomial"][1] = "0x" + bytes(raw).hex()
    with pytest.raises(Exception):
        check_trusted_setup_is_well_formed(bad)


def test_context_opt_in_path(small_setup):
    """Context(check_well_formed=True) runs the checker before parsing."""
    from goethkzg_tpu import api
    bad = dict(small_setup)
    bad["g1_monomial"] = list(bad["g1_monomial"])
    bad["g1_monomial"][0] = "0x" + gcurve.g1_compress(non_subgroup_point()).hex()
    with pytest.raises(Exception):
        api.Context(setup=bad, check_well_formed=True)
