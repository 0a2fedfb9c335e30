"""RNS curve layer + fixed-base table MSM vs the golden model.

The RCB-over-RNS group law (ops/rns_msm.py) must match golden affine
arithmetic through the value map v = value(res) * M_A^{-1} mod p,
including the complete-law edge cases (identity, doubling, inverses),
and the full table-MSM must reproduce the golden MSM for the same
signed-digit table the positional Pallas kernel uses."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD, R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden import field as gf
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops import field as field_mod
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec, int_to_limbs
from goethkzg_tpu.ops.rns import fp_rns
from goethkzg_tpu.ops.rns_jax import RNSOps
from goethkzg_tpu.ops.rns_msm import (RNSCurve, convert_table_to_rns,
                                      rns_msm_to_limbs, rns_table_msm)

CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _cpu():
    with field_mod.pallas_disabled(), jax.default_device(CPU):
        yield


@pytest.fixture(scope="module")
def ops():
    return RNSOps(fp_rns())


def _to_rns_pt(ops, pt):
    """golden affine (x, y) -> RNS-Montgomery coordinate arrays [2k]."""
    S = ops.spec
    return (np.array(S.to_mont_rns(pt[0]), dtype=np.uint32),
            np.array(S.to_mont_rns(pt[1]), dtype=np.uint32))


def _proj_to_golden(ops, X, Y, Z):
    """RNS projective (complete coords) -> golden affine or None."""
    S = ops.spec
    MAinv = pow(S.A.M, -1, S.p)

    def val(r):
        return S.value(list(np.asarray(r))) * MAinv % S.p

    x, y, z = val(X), val(Y), val(Z)
    if z == 0:
        return None
    zi = gf.fp_inv(z)
    return (x * zi % P_MOD, y * zi % P_MOD)


def test_group_law_vs_golden(ops):
    curve = RNSCurve(ops)
    jit_mixed = jax.jit(curve.mixed_add)
    jit_add = jax.jit(curve.add)
    g = gc.g1_generator()
    p2 = gc.g1_add(g, g)
    p3 = gc.g1_add(p2, g)
    neg_g = (g[0], P_MOD - g[1])

    cases = [(g, p2), (p2, p3), (g, g), (p3, p3), (g, neg_g)]
    for a, b in cases:
        ax_, ay_ = _to_rns_pt(ops, a)
        P1 = (jnp.asarray(ax_[None]), jnp.asarray(ay_[None]),
              jnp.broadcast_to(curve.one, (1, ops.n_res)))
        B = _to_rns_pt(ops, b)
        got = jit_mixed(P1, (B[0][None], B[1][None]))
        want = gc.g1_add(a, b)
        res = _proj_to_golden(ops, got[0][0], got[1][0], got[2][0])
        assert res == want, (a, b)

        # complete projective add (incl. identity)
        P2 = (jnp.asarray(B[0][None]), jnp.asarray(B[1][None]),
              jnp.broadcast_to(curve.one, (1, ops.n_res)))
        got2 = jit_add(P1, P2)
        assert _proj_to_golden(ops, got2[0][0], got2[1][0],
                               got2[2][0]) == want

    inf = curve.infinity((1,))
    P1 = (jnp.asarray(_to_rns_pt(ops, g)[0][None]),
          jnp.asarray(_to_rns_pt(ops, g)[1][None]),
          jnp.broadcast_to(curve.one, (1, ops.n_res)))
    got = jit_add(inf, P1)
    assert _proj_to_golden(ops, got[0][0], got[1][0], got[2][0]) == g



@pytest.mark.heavy
def test_rns_table_msm_vs_golden(ops):
    """heavy: the scan-body compile (11 RNS muls + conversions) takes
    >10 min on the 1-core CPU host — run where a TPU is attached."""
    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    from goethkzg_tpu.serialization import g1_points_to_device_arrays

    N, B = 8, 2
    _, lag, _ = insecure_srs(N, secret=4321)
    pts_dev = g1_points_to_device_arrays(lag)
    fp = fp_spec()
    curve_pos = CurveOps(fp)

    table = ptm.build_table_device(curve_pos, pts_dev, wbits=4,
                                   pair_order="wN")
    trns = convert_table_to_rns(ops, np.asarray(table[0]),
                                np.asarray(table[1]))

    rng = random.Random(7)
    scalars = [[rng.randrange(R_MOD) for _ in range(N)] for _ in range(B)]
    scal_limbs = np.stack([
        np.stack([int_to_limbs(s, 16) for s in row]) for row in scalars])

    packed = np.asarray(ptm.pack_digits_lanes(jnp.asarray(scal_limbs),
                                              wbits=4))
    acc = jax.jit(lambda t, d: rns_table_msm(ops, t, d))(trns,
                                                         jnp.asarray(packed))
    X, Y, Z = (np.asarray(c) for c in
               jax.jit(lambda a: rns_msm_to_limbs(ops, a))(acc))

    for b in range(B):
        want = None
        for p, s in zip(lag, scalars[b]):
            want = gc.g1_add(want, gc.g1_scalar_mul(p, s))

        def limbs_int(row):
            v = 0
            for i, l in enumerate(row.tolist()):
                v |= int(l) << (16 * i)
            return v

        x, y, z = (limbs_int(X[b]) % P_MOD, limbs_int(Y[b]) % P_MOD,
                   limbs_int(Z[b]) % P_MOD)
        if z == 0:
            assert want is None
            continue
        zi = gf.fp_inv(z)
        got = (x * zi % P_MOD, y * zi % P_MOD)
        assert got == want, f"blob {b}"
