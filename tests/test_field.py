"""Differential tests: limb field engine vs pure-Python ints.

The analog of the reference's optimized-vs-naive double implementations
(SURVEY.md §4.2); runs on the CPU backend so it is always exercised.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goethkzg_tpu.ops.field import fp_spec, fr_spec, int_to_limbs, limbs_to_int

CPU = jax.devices("cpu")[0]


@pytest.mark.parametrize("spec", [fr_spec(), fp_spec()], ids=["fr", "fp"])
def test_field_ops_match_golden(spec):
    M = spec.modulus
    rng = random.Random(42)
    xs = [rng.randrange(M) for _ in range(32)] + [0, 1, M - 1, M - 2]
    ys = [rng.randrange(M) for _ in range(32)] + [1, 0, M - 1, 1]
    a = jax.device_put(np.stack([spec.from_int(x) for x in xs]), CPU)
    b = jax.device_put(np.stack([spec.from_int(y) for y in ys]), CPU)
    with jax.default_device(CPU):
        add = jax.jit(spec.add)(a, b)
        sub = jax.jit(spec.sub)(a, b)
        mul = jax.jit(spec.mul)(a, b)
        neg = jax.jit(spec.neg)(a)
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert spec.to_int(add[i]) == (x + y) % M
        assert spec.to_int(sub[i]) == (x - y) % M
        assert spec.to_int(mul[i]) == (x * y) % M
        assert spec.to_int(neg[i]) == (-x) % M


def test_fr_inversion_and_batch_inv():
    fr = fr_spec()
    M = fr.modulus
    rng = random.Random(7)
    xs = [rng.randrange(1, M) for _ in range(16)] + [0]
    a = jax.device_put(np.stack([fr.from_int(x) for x in xs]), CPU)
    with jax.default_device(CPU):
        inv = jax.jit(fr.inv)(a)
        binv = jax.jit(lambda v: fr.batch_inv(v))(a)
    for i, x in enumerate(xs):
        expect = pow(x, M - 2, M)
        assert fr.to_int(inv[i]) == expect
        assert fr.to_int(binv[i]) == expect


def test_mont_roundtrip_and_canonicality():
    fr = fr_spec()
    M = fr.modulus
    raw = np.stack([int_to_limbs(v, 16) for v in (0, 1, M - 1, 12345)])
    with jax.default_device(CPU):
        tm = jax.jit(fr.to_mont)(jax.device_put(raw, CPU))
        fm = jax.jit(fr.from_mont)(tm)
        lt = jax.jit(fr.is_lt_modulus)(jax.device_put(raw, CPU))
        big = jax.jit(fr.is_lt_modulus)(
            jax.device_put(int_to_limbs(M, 16)[None], CPU))
    assert [limbs_to_int(r) for r in np.asarray(fm)] == [0, 1, M - 1, 12345]
    assert bool(jnp.all(lt)) and not bool(big[0])


import pytest as _pytest


@_pytest.fixture(autouse=True)
def _jnp_field_path():
    """These tests trace for the CPU backend: keep the jnp field path."""
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled():
        yield
