"""NTT / coset-FFT / bit-reversal differential tests vs the naive DFT.

Mirrors the reference's fft-vs-recursive-reference tests
(internal/domain/fft_test.go:58-102) and brp tests (domain_test.go:48-87).
"""

import random

import jax
import numpy as np

from goethkzg_tpu.constants import R_MOD
from goethkzg_tpu.ops.field import fr_spec
from goethkzg_tpu.ops.ntt import (CosetDomain, Domain, bitrev_indices,
                                  root_of_unity)

CPU = jax.devices("cpu")[0]


def test_root_of_unity_orders():
    for n in (2, 64, 4096, 8192):
        g = root_of_unity(n)
        assert pow(g, n, R_MOD) == 1
        assert pow(g, n // 2, R_MOD) != 1


def test_bitrev_indices():
    assert list(bitrev_indices(8)) == [0, 4, 2, 6, 1, 5, 3, 7]
    rev = bitrev_indices(4096)
    assert all(rev[rev[i]] == i for i in range(0, 4096, 97))


def test_fft_matches_naive_dft_and_roundtrips():
    fr = fr_spec()
    rng = random.Random(3)
    N = 32
    dom = Domain(N)
    vals = [rng.randrange(R_MOD) for _ in range(N)]
    x = jax.device_put(np.stack([fr.from_int(v) for v in vals]), CPU)
    with jax.default_device(CPU):
        out = jax.jit(dom.fft)(x)
        rt = jax.jit(dom.ifft)(out)
    g = dom.generator
    for k in (0, 1, 7, N - 1):
        expect = sum(vals[i] * pow(g, i * k, R_MOD) for i in range(N)) % R_MOD
        assert fr.to_int(out[k]) == expect
    assert all(fr.to_int(rt[i]) == vals[i] for i in range(N))


def test_coset_fft_matches_naive():
    fr = fr_spec()
    rng = random.Random(5)
    N = 16
    dom = Domain(N)
    cd = CosetDomain(dom, 7)
    vals = [rng.randrange(R_MOD) for _ in range(N)]
    x = jax.device_put(np.stack([fr.from_int(v) for v in vals]), CPU)
    with jax.default_device(CPU):
        c = jax.jit(cd.coset_fft)(x)
        rt = jax.jit(cd.coset_ifft)(c)
    g = dom.generator
    for k in (0, 3, N - 1):
        pt = 7 * pow(g, k, R_MOD) % R_MOD
        expect = sum(vals[i] * pow(pt, i, R_MOD) for i in range(N)) % R_MOD
        assert fr.to_int(c[k]) == expect
    assert all(fr.to_int(rt[i]) == vals[i] for i in range(N))


import pytest as _pytest


@_pytest.fixture(autouse=True)
def _jnp_field_path():
    """These tests trace for the CPU backend: keep the jnp field path."""
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled():
        yield
