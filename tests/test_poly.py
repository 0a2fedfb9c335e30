"""Differential tests: coefficient poly helpers vs pure-Python ints.

Mirrors the reference's poly unit tests (reference: internal/poly/
poly_test.go) — add/mul/eval against big-int oracles, and the synthetic
division identity q*(X-z) + r == p with r == p(z).
"""

import random

import jax
import numpy as np

from goethkzg_tpu.constants import R_MOD
from goethkzg_tpu.ops.field import fr_spec
from goethkzg_tpu.ops.poly import (divide_by_x_minus_a, poly_add, poly_eval,
                                   poly_mul)

CPU = jax.devices("cpu")[0]
FR = fr_spec()


def _mont(ints):
    return jax.device_put(np.stack([FR.from_int(v) for v in ints]), CPU)


def _ints(arr):
    arr = np.asarray(arr)
    return [FR.to_int(arr[i]) for i in range(arr.shape[0])]


def _eval_int(coeffs, z):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % R_MOD
    return acc


def test_poly_add_mul_eval_match_golden():
    rng = random.Random(3)
    a_int = [rng.randrange(R_MOD) for _ in range(7)]
    b_int = [rng.randrange(R_MOD) for _ in range(5)] + [0]  # trailing zero
    z_int = rng.randrange(R_MOD)
    a, b, z = _mont(a_int), _mont(b_int), _mont([z_int])[0]

    with jax.default_device(CPU):
        s = jax.jit(lambda x, y: poly_add(FR, x, y))(a, b)
        p = jax.jit(lambda x, y: poly_mul(FR, x, y))(a, b)
        y = jax.jit(lambda x, zz: poly_eval(FR, x, zz))(a, z)

    want_sum = [(x + (b_int[i] if i < len(b_int) else 0)) % R_MOD
                for i, x in enumerate(a_int)]
    assert _ints(s) == want_sum

    want_mul = [0] * (len(a_int) + len(b_int) - 1)
    for i, x in enumerate(a_int):
        for j, yv in enumerate(b_int):
            want_mul[i + j] = (want_mul[i + j] + x * yv) % R_MOD
    assert _ints(p) == want_mul

    assert FR.to_int(y) == _eval_int(a_int, z_int)


def test_synthetic_division_identity():
    rng = random.Random(4)
    p_int = [rng.randrange(R_MOD) for _ in range(9)]
    z_int = rng.randrange(R_MOD)
    p, z = _mont(p_int), _mont([z_int])[0]

    with jax.default_device(CPU):
        q, r = jax.jit(lambda x, zz: divide_by_x_minus_a(FR, x, zz))(p, z)

    q_int = _ints(q)
    r_int = FR.to_int(r)
    assert r_int == _eval_int(p_int, z_int)

    # q * (X - z) + r == p, checked coefficient-wise over the ints
    recon = [0] * len(p_int)
    for i, qc in enumerate(q_int):          # q[i] * X^{i+1}
        recon[i + 1] = (recon[i + 1] + qc) % R_MOD
        recon[i] = (recon[i] - qc * z_int) % R_MOD
    recon[0] = (recon[0] + r_int) % R_MOD
    assert recon == p_int


def test_exact_division_of_vanishing_multiple():
    """(X - z) * t(X) divided by (X - z) returns t with zero remainder —
    the quotient shape the KZG prover needs (reference: poly.go:113)."""
    rng = random.Random(5)
    t_int = [rng.randrange(R_MOD) for _ in range(6)]
    z_int = rng.randrange(R_MOD)
    t, z = _mont(t_int), _mont([z_int])[0]
    lin = _mont([(-z_int) % R_MOD, 1])      # (X - z)

    with jax.default_device(CPU):
        p = poly_mul(FR, lin, t)
        q, r = divide_by_x_minus_a(FR, p, z)

    assert FR.to_int(r) == 0
    assert _ints(q) == t_int
