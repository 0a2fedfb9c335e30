"""pallas_chain one-launch power chains vs the jnp scan paths.

Interpret mode on CPU: the kernel must be bit-identical to
FieldSpec.pow_const / pow_const_windowed (which test_field.py pins to
python pow), including 0 -> 0 Fermat-inversion semantics and lane
padding."""

import jax
import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD, R_MOD
from goethkzg_tpu.ops import pallas_chain
from goethkzg_tpu.ops.field import fp_spec, fr_spec, int_to_limbs

CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled(), jax.default_device(CPU):
        yield


def _rand_elems(spec, k, seed):
    rng = np.random.default_rng(seed)
    vals = [int(x) % spec.modulus
            for x in rng.integers(1, 1 << 63, size=k)]
    vals[0] = 0                     # 0 -> 0 semantics
    vals[1] = spec.modulus - 1
    return vals, np.stack([spec.from_int(v) for v in vals])


@pytest.mark.parametrize("which", ["fr", "fp"])
def test_pow_chain_matches_scan(which):
    spec = fr_spec() if which == "fr" else fp_spec()
    exps = [2, 3, (spec.modulus + 1) // 4 if which == "fp" else 12345,
            spec.modulus - 2]
    vals, a = _rand_elems(spec, 5, seed=3)
    for e in exps:
        want = np.asarray(spec.pow_const_windowed(a, e))
        got = np.asarray(pallas_chain.pow_const(spec, a, e,
                                                interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"exp={e}")
        # and against python pow on the raw values
        for i, v in enumerate(vals):
            assert spec.to_int(got[i]) == pow(v, e, spec.modulus)


def test_pow_chain_batch_dims():
    spec = fr_spec()
    _, a = _rand_elems(spec, 6, seed=4)
    a3 = a.reshape(2, 3, spec.n)
    got = np.asarray(pallas_chain.pow_const(spec, a3, R_MOD - 2,
                                            interpret=True))
    want = np.asarray(spec.pow_const(a3, R_MOD - 2))
    np.testing.assert_array_equal(got, want)


def test_inv_zero_to_zero():
    spec = fp_spec()
    a = np.stack([spec.from_int(0), spec.from_int(7)])
    got = np.asarray(pallas_chain.pow_const(spec, a, P_MOD - 2,
                                            interpret=True))
    assert spec.to_int(got[0]) == 0
    assert (spec.to_int(got[1]) * 7 * pow(2 ** (16 * 24), 1, P_MOD)
            % P_MOD) == pow(2 ** (16 * 24), 2, P_MOD) % P_MOD or True
    # direct check: got[1] is Montgomery of 7^{-1}
    assert spec.to_int(got[1]) == pow(7, -1, P_MOD)
