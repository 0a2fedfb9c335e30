"""Device pairing vs the golden host pairing (differential oracle).

The TPU optimal-ate pairing (ops/pairing.py) must agree with the
obviously-correct golden model on accepting and rejecting checks,
including infinity-pair handling (gnark PairingCheck semantics).
Heavy: compiles/runs on the TPU backend.
"""

import numpy as np
import pytest

from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden import pairing as gp

pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def check2():
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu.ops import pairing as dpair
    from goethkzg_tpu.ops.field import fp_spec
    from goethkzg_tpu.ops.field2 import fp2_field

    tw = dpair.get_tower()
    fp, f2 = fp_spec(), fp2_field()

    fn = jax.jit(lambda p1x, p1y, v1, q1x, q1y, p2x, p2y, v2, q2x, q2y:
                 dpair.pairing_check_2(tw, (p1x, p1y), (q1x, q1y), v1,
                                       (p2x, p2y), (q2x, q2y), v2))

    def run(pairs):
        args = []
        for p, q in pairs:
            valid = p is not None and q is not None
            args.append(jnp.asarray(fp.from_int(p[0] if p else 0)))
            args.append(jnp.asarray(fp.from_int(p[1] if p else 0)))
            args.append(jnp.asarray(np.bool_(valid)))
            args.append(jnp.asarray(f2.from_ints(q[0] if q else (0, 0))))
            args.append(jnp.asarray(f2.from_ints(q[1] if q else (0, 0))))
        return bool(fn(*args))

    return run


def test_device_pairing_matches_golden(check2):
    g1, g2 = gc.g1_generator(), gc.g2_generator()
    a, b = 31337, 271828
    accept = [
        (gc.g1_neg(gc.g1_scalar_mul(g1, a * b)), g2),
        (gc.g1_scalar_mul(g1, a), gc.g2_scalar_mul(g2, b)),
    ]
    reject = [(g1, g2), (g1, g2)]
    inf_pair = [(None, g2), (gc.g1_neg(gc.g1_scalar_mul(g1, 7)),
                             gc.g2_scalar_mul(g2, 0) if False else None)]
    assert check2(accept) is True
    assert gp.pairing_check(accept) is True
    assert check2(reject) is False
    assert gp.pairing_check(reject) is False
    # both pairs masked to identity -> product is 1
    assert check2(inf_pair) is True


def test_device_pairing_single_live_pair_rejects(check2):
    g1, g2 = gc.g1_generator(), gc.g2_generator()
    # one identity pair + one non-identity pair -> must reject
    assert check2([(None, g2), (g1, g2)]) is False
