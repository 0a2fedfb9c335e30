"""Small-N differential tests: FK20 multi-open vs a naive quotient oracle.

Mirrors the reference's FK20-vs-naive strategy
(reference: internal/kzg_multi/kzg_prove_test.go:18-124) at toy sizes
(poly 16, coset 4) on the CPU fallback path, with the oracle computed in
host big-int arithmetic:

    for coset k with shift s_k:   Z_k(X) = X^cs - s_k^cs
    q_k = (p - I_k) / Z_k         (exact synthetic division)
    proof_k = <q_k, monomial SRS>  (golden scalar-mul/add)

Also pins the closed-form stage-2 matrix (engines/fk20.py
composite_proof_matrix) against a direct IFFT->trunc->pad->FFT->brp
transform oracle, and the coset evaluation partitioning.
"""

import numpy as np
import pytest

from goethkzg_tpu.constants import R_MOD
from goethkzg_tpu.engines.fk20 import FK20, composite_proof_matrix
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec, fr_spec
from goethkzg_tpu.ops.ntt import bitrev_indices, get_domain, root_of_unity
from goethkzg_tpu.serialization import g1_points_to_device_arrays

POLY, CS = 16, 4
EXT = 2 * POLY
NC = EXT // CS
FP = fp_spec()
FR = fr_spec()
CURVE = CurveOps(FP)


@pytest.fixture(autouse=True)
def _cpu_path():
    import jax
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled(), jax.default_device(jax.devices("cpu")[0]):
        yield


def _coset_shifts():
    """Shift of coset k = brp-ordered extended-domain root k*cs (matches
    engines/kzg_multi.MultiPointOpeningKey)."""
    ext = get_domain(EXT)
    rev = bitrev_indices(EXT)
    return [ext.roots_int[rev[k * CS]] for k in range(NC)]


def _divide_by_vanishing(poly_ints, c):
    """q, r with p = q * (X^cs - c) + r, deg r < cs (host big-int)."""
    r = list(poly_ints)
    q = [0] * (len(r) - CS)
    for i in range(len(r) - 1, CS - 1, -1):
        q[i - CS] = r[i]
        r[i - CS] = (r[i - CS] + c * r[i]) % R_MOD
        r[i] = 0
    return q, r[:CS]


def _naive_commit(mono_pts, coeff_ints):
    acc = None
    for p, s in zip(mono_pts, coeff_ints):
        if s == 0:
            continue
        acc = gc.g1_add(acc, gc.g1_scalar_mul(p, s))
    return acc


def _jac_to_golden(res, i):
    pts = tuple(np.asarray(c)[i] for c in res)
    ax, ay, ainf = (np.asarray(a) for a in CURVE.to_affine(
        tuple(c[None] for c in pts)))
    if bool(ainf[0]):
        return None
    return (FP.to_int(ax[0]), FP.to_int(ay[0]))


@pytest.fixture(scope="module")
def setup():
    mono, _, _ = insecure_srs(POLY, secret=1234)
    arrays = g1_points_to_device_arrays(mono)
    fk = FK20(CURVE, arrays, poly_size=POLY, coset_size=CS)
    return mono, fk


def test_fk20_proofs_match_naive_quotients(setup):
    mono, fk = setup
    rng = np.random.default_rng(42)
    coeffs = [int(x) % R_MOD for x in rng.integers(0, 1 << 62, size=POLY)]
    coeffs[0] = 0                      # exercise zero scalars
    poly_mont = np.stack([FR.from_int(c) for c in coeffs])[None]

    proofs = fk.multi_open_proofs(np.asarray(poly_mont, dtype=np.uint32))
    shifts = _coset_shifts()
    for k in range(NC):
        q, _ = _divide_by_vanishing(coeffs, pow(shifts[k], CS, R_MOD))
        want = _naive_commit(mono, q)
        got = _jac_to_golden(tuple(c[0] for c in proofs), k)
        assert got == want, f"coset {k}"


def test_extended_evaluations_match_pointwise(setup):
    _, fk = setup
    rng = np.random.default_rng(7)
    coeffs = [int(x) % R_MOD for x in rng.integers(0, 1 << 62, size=POLY)]
    poly_mont = np.stack([FR.from_int(c) for c in coeffs])
    evals = np.asarray(fk.extended_evaluations(
        np.asarray(poly_mont, dtype=np.uint32)[None]))[0]
    shifts = _coset_shifts()
    w = root_of_unity(EXT)
    for k in range(0, NC, 3):
        for j in range(CS):
            # point j of coset k is shift_k * w^(brp step): the partition is
            # brp-ordered so consecutive entries stride the extended domain
            x = _coset_point(shifts, k, j, w)
            want = 0
            for i, c in enumerate(coeffs):
                want = (want + c * pow(x, i, R_MOD)) % R_MOD
            assert FR.to_int(evals[k, j]) == want, (k, j)


def _coset_point(shifts, k, j, w):
    """Evaluation point j of coset k under the brp partition."""
    ext = get_domain(EXT)
    rev = bitrev_indices(EXT)
    return ext.roots_int[rev[k * CS + j]]


def test_composite_matrix_matches_transform_oracle():
    """c[i,k] closed form == brp∘FFT∘pad∘trunc∘IFFT applied to unit vectors."""
    nc = 8
    half = nc // 2
    dom = get_domain(nc)
    rev = bitrev_indices(nc)
    k_idx, coeffs = composite_proof_matrix(nc)
    dense = np.zeros((nc, nc), dtype=object)
    for i in range(nc):
        for p in range(k_idx.shape[1]):
            dense[i, k_idx[i, p]] = (dense[i, k_idx[i, p]]
                                     + int(coeffs[i, p])) % R_MOD
    w = root_of_unity(nc)
    n_inv = pow(nc, -1, R_MOD)
    for k in range(nc):
        # IFFT of unit vector e_k: coeff_j = w^{-kj} / nc
        vec = [pow(w, (-k * j) % nc, R_MOD) * n_inv % R_MOD
               if j < half else 0 for j in range(nc)]   # trunc + pad
        # FFT back: out_m = sum_j vec_j w^{mj}; then brp
        for i in range(nc):
            m = int(rev[i])
            want = 0
            for j in range(half):
                want = (want + vec[j] * pow(w, m * j, R_MOD)) % R_MOD
            assert dense[i, k] == want, (i, k)
