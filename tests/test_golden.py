"""Golden-model self-tests: curve law, codec, pairing, SRS, Fiat-Shamir.

Byte-level regression values mirror the reference's interop tests
(fiatshamir_test.go:14-37, serialization_test.go:14).
"""

import random

from goethkzg_tpu import fiatshamir
from goethkzg_tpu.constants import BYTES_PER_BLOB, R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden import field as gf
from goethkzg_tpu.golden import pairing as gp
from goethkzg_tpu.golden.srs import insecure_srs, lagrange_coeffs_at


def test_generator_encodings():
    g1 = gc.g1_generator()
    assert gc.g1_compress(g1).hex().startswith("97f1d3a73197d794")
    assert gc.g1_decompress(gc.g1_compress(g1)) == g1
    g2 = gc.g2_generator()
    assert gc.g2_decompress(gc.g2_compress(g2)) == g2


def test_infinity_encoding():
    inf = bytes([0xC0] + [0] * 47)
    assert gc.g1_decompress(inf) is None
    assert gc.g1_compress(None) == inf


def test_subgroup_check_rejects_cofactor_points():
    x = 3
    while True:
        y = gf.fp_sqrt((x * x * x + 4) % gf.P)
        if y is not None:
            break
        x += 1
    assert gc.g1_is_on_curve((x, y))
    assert not gc.g1_in_subgroup((x, y))


def test_group_law_consistency():
    rng = random.Random(11)
    g1 = gc.g1_generator()
    a, b = rng.randrange(R_MOD), rng.randrange(R_MOD)
    lhs = gc.g1_add(gc.g1_scalar_mul(g1, a), gc.g1_scalar_mul(g1, b))
    rhs = gc.g1_scalar_mul(g1, (a + b) % R_MOD)
    assert lhs == rhs


def test_pairing_bilinearity_and_fast_final_exp():
    g1, g2 = gc.g1_generator(), gc.g2_generator()
    a, b = 1234, 5678
    ok = gp.pairing_check([
        (gc.g1_neg(gc.g1_scalar_mul(g1, a * b)), g2),
        (gc.g1_scalar_mul(g1, a), gc.g2_scalar_mul(g2, b)),
    ])
    assert ok
    assert not gp.pairing_check([(g1, g2), (g1, g2)])
    # fast hard-part equals the naive oracle
    f = gp.miller_loop(g1, g2)
    assert gf.fp12_eq_one(gp.final_exponentiation(f)) == \
        gp.final_exp_is_one_fast(f)


def test_insecure_srs_lagrange_consistency():
    # commit to a poly in both bases; results must agree
    rng = random.Random(9)
    n, secret = 8, 1234
    mono, lag, g2s = insecure_srs(n, secret)
    from goethkzg_tpu.ops.ntt import root_of_unity
    g = root_of_unity(n)
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    evals = [sum(c * pow(g, i * j, R_MOD) for j, c in enumerate(coeffs)) % R_MOD
             for i in range(n)]
    commit_mono = None
    for c, p in zip(coeffs, mono):
        commit_mono = gc.g1_add(commit_mono, gc.g1_scalar_mul(p, c))
    commit_lag = None
    for e, p in zip(evals, lag):
        commit_lag = gc.g1_add(commit_lag, gc.g1_scalar_mul(p, e))
    assert commit_mono == commit_lag


def test_fiat_shamir_layout():
    # u64 -> 16 bytes big-endian, first 8 bytes zero (fiatshamir.go:36-40)
    assert fiatshamir.u64_to_bytes16(4096).hex() == \
        "00000000000000000000000000001000"
    blob = bytes(BYTES_PER_BLOB)
    comm = bytes(48)
    c = fiatshamir.compute_challenge(blob, comm)
    assert 0 <= c < R_MOD
    # deterministic
    assert c == fiatshamir.compute_challenge(blob, comm)
