"""RNS Montgomery core: golden model vs plain ints vs the jnp kernels.

The RNS tier (ops/rns.py golden, ops/rns_jax.py device) must be
bit-identical between themselves and value-correct against python int
arithmetic, including the approximate-then-exact base-extension pair and
the lazy magnitude discipline."""

import random

import jax
import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD, R_MOD
from goethkzg_tpu.ops.rns import RNSSpec, fp_rns, fr_rns
from goethkzg_tpu.ops.rns_jax import RNSOps

CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _cpu():
    with jax.default_device(CPU):
        yield


@pytest.mark.parametrize("P", [R_MOD, P_MOD], ids=["fr", "fp"])
def test_golden_mul_against_ints(P):
    S = RNSSpec(P)
    MAinv = pow(S.A.M, -1, P)
    rng = random.Random(1)
    cases = [(0, 0), (1, 1), (P - 1, P - 1), (3 * P - 1, 3 * P - 1),
             (S.c * P - 1, S.c * P - 1)]
    cases += [(rng.randrange(3 * P), rng.randrange(3 * P))
              for _ in range(100)]
    for x, y in cases:
        out = S.mul(S.to_rns(x), S.to_rns(y))
        v = S.value(out)
        assert v < 3 * P
        assert v % P == x * y * MAinv % P

    # chains stay closed under the <3p bound
    acc = S.to_rns(rng.randrange(P))
    accv = S.value(acc)
    for _ in range(30):
        b = rng.randrange(3 * P)
        acc = S.mul(acc, S.to_rns(b))
        accv = accv * b * MAinv % P
        assert S.value(acc) % P == accv and S.value(acc) < 3 * P


@pytest.mark.parametrize("P", [R_MOD, P_MOD], ids=["fr", "fp"])
def test_jax_matches_golden(P):
    S = fr_rns() if P == R_MOD else fp_rns()
    ops = RNSOps(S)
    rng = random.Random(2)
    xs = [rng.randrange(3 * P) for _ in range(257)] + [0, 1, 3 * P - 1]
    ys = [rng.randrange(3 * P) for _ in range(257)] + [3 * P - 1, 0, P]
    xr = np.stack([np.array(S.to_rns(x), dtype=np.uint32) for x in xs])
    yr = np.stack([np.array(S.to_rns(y), dtype=np.uint32) for y in ys])

    got = np.asarray(jax.jit(ops.mul)(xr, yr))
    for i, (x, y) in enumerate(zip(xs, ys)):
        want = S.mul(S.to_rns(x), S.to_rns(y))
        np.testing.assert_array_equal(
            got[i], np.array(want, dtype=np.uint32), err_msg=f"case {i}")

    ga = np.asarray(jax.jit(ops.add)(xr, yr))
    gs = np.asarray(jax.jit(lambda a, b: ops.sub(a, b, 3))(xr, yr))
    for i, (x, y) in enumerate(zip(xs, ys)):
        np.testing.assert_array_equal(
            ga[i], np.array(S.add(S.to_rns(x), S.to_rns(y)),
                            dtype=np.uint32))
        np.testing.assert_array_equal(
            gs[i], np.array(S.sub(S.to_rns(x), S.to_rns(y), 3),
                            dtype=np.uint32))


@pytest.mark.parametrize("P", [R_MOD, P_MOD], ids=["fr", "fp"])
def test_conversions_roundtrip(P):
    S = fr_rns() if P == R_MOD else fp_rns()
    ops = RNSOps(S)
    rng = random.Random(3)
    n = ops.n_limbs
    vals = [rng.randrange(P) for _ in range(64)] + [0, 1, P - 1]
    limbs = np.stack([
        np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                 dtype=np.uint32) for v in vals])
    res = np.asarray(jax.jit(ops.from_limbs)(limbs))
    for i, v in enumerate(vals):
        np.testing.assert_array_equal(
            res[i], np.array(S.to_rns(v), dtype=np.uint32))

    # value < 3p reconstructs exactly through the CRT matmul
    vals3 = [rng.randrange(3 * P) for _ in range(64)] + [0, 3 * P - 1]
    rr = np.stack([np.array(S.to_rns(v), dtype=np.uint32) for v in vals3])
    out = np.asarray(jax.jit(ops.to_value_limbs)(rr))
    for i, v in enumerate(vals3):
        got = 0
        for l in range(out.shape[1]):
            got |= int(out[i, l]) << (16 * l)
        assert got == v, f"case {i}"
