"""Small-N CPU differential tests for Reed-Solomon cell recovery.

Mirrors the reference's erasure tests
(reference: internal/erasure_code/erasure_code_test.go) at a toy shape
(block 4 x 4 blocks -> 16-point codeword, poly 8): erase up to half the
blocks from the codeword, recover, and demand the exact original
coefficients back — plus the vanishing-poly invariants the pipeline rests
on (zero exactly on erased blocks' roots, nonzero elsewhere).

Block structure: block i owns the natural-order codeword indices
{j : j % num_blocks == i} (the api layer's brp cell shuffle lands each
cell on such a stride class — api.py _recover_poly_coeffs).
"""

import numpy as np
import pytest

from goethkzg_tpu.constants import R_MOD
from goethkzg_tpu.engines.erasure import DataRecovery
from goethkzg_tpu.ops.field import fr_spec
from goethkzg_tpu.ops.ntt import get_domain

BS, NB = 4, 4
EXT = BS * NB
POLY = EXT // 2
FR = fr_spec()


@pytest.fixture(autouse=True)
def _cpu_path():
    import jax
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled(), jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture(scope="module")
def rec():
    return DataRecovery(block_size=BS, num_blocks=NB)


def _random_codeword(seed):
    rng = np.random.default_rng(seed)
    coeffs = [int(x) % R_MOD for x in rng.integers(0, 1 << 62, size=POLY)]
    dom = get_domain(EXT)
    evals = []
    for j in range(EXT):
        x = dom.roots_int[j]
        v = 0
        for i, c in enumerate(coeffs):
            v = (v + c * pow(x, i, R_MOD)) % R_MOD
        evals.append(v)
    return coeffs, evals


@pytest.mark.parametrize("missing", [[1], [0, 3], [2, 3]])
def test_recover_exact_coeffs(rec, missing):
    coeffs, evals = _random_codeword(seed=13 + sum(missing))
    data = np.zeros((EXT, FR.n), dtype=np.uint32)
    for j in range(EXT):
        if j % NB not in missing:
            data[j] = FR.from_int(evals[j])
    got = np.asarray(rec.recover_poly_coeffs(data, missing))
    for i in range(POLY):
        assert FR.to_int(got[i]) == coeffs[i], f"coeff {i}"


def test_recover_no_missing_is_identity(rec):
    coeffs, evals = _random_codeword(seed=99)
    data = np.stack([FR.from_int(v) for v in evals])
    got = np.asarray(rec.recover_poly_coeffs(data, []))
    for i in range(POLY):
        assert FR.to_int(got[i]) == coeffs[i]


def test_vanishing_poly_roots(rec):
    missing = [0, 2]
    z = rec.vanishing_poly_coeffs(missing)
    zi = [FR.to_int(z[i]) for i in range(EXT)]
    dom = get_domain(EXT)
    for j in range(EXT):
        x = dom.roots_int[j]
        v = 0
        for i, c in enumerate(zi):
            v = (v + c * pow(x, i, R_MOD)) % R_MOD
        if j % NB in missing:
            assert v == 0, f"Z must vanish on erased index {j}"
        else:
            assert v != 0, f"Z must not vanish on surviving index {j}"
