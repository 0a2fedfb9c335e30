"""Interpret-mode bit-equality of the MXU-conv Montgomery mul
(ops/pallas_mxu.py) against FieldSpec.mul, Fr and Fp, including edge
values (0, 1, p-1, values with all-0xFFFF limbs after reduction)."""

import numpy as np
import pytest

from goethkzg_tpu.ops.field import fp_spec, fr_spec, pallas_disabled
from goethkzg_tpu.ops.pallas_mxu import mont_mul_mxu


@pytest.mark.parametrize("spec", [fr_spec(), fp_spec()],
                         ids=["fr", "fp"])
def test_mont_mul_mxu_matches_jnp(spec):
    rng = np.random.default_rng(11)
    vals = [0, 1, spec.modulus - 1, spec.R_mod,
            (1 << (16 * spec.n - 17)) - 1]
    vals += [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
             % spec.modulus for _ in range(11)]
    a = np.stack([spec.from_int(v) for v in vals])          # mont form
    b = np.stack([spec.from_int(v) for v in reversed(vals)])
    with pallas_disabled():
        ref = np.asarray(spec.mul(a, b))
    got = np.asarray(mont_mul_mxu(spec, a, b, interpret=True))
    assert (ref == got).all()
