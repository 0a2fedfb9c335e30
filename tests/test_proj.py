"""Complete projective (RCB15) group law vs the golden model.

The round-2 kernels accumulate in homogeneous projective coordinates with
the a=0 complete formulas (ops/proj.py); these tests pin every exceptional
case the formulas claim to absorb: P+Q, P+P, P+(-P), either side infinity,
and the Jacobian bridge.
"""

import jax
import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden import field as gf
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops import proj
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec

CPU = jax.devices("cpu")[0]


@pytest.fixture(autouse=True)
def _jnp_field_path():
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled():
        yield


def _pts(n=8, secret=777):
    _, lag, _ = insecure_srs(8, secret=secret)   # domain size: power of two
    return lag[:n]


def _to_proj(fp, golden_pts):
    """Golden affine tuples (or None) -> projective limb arrays [N, n]."""
    xs, ys, zs = [], [], []
    for p in golden_pts:
        if p is None:
            xs.append(fp.from_int(0))
            ys.append(fp.from_int(1))
            zs.append(fp.from_int(0))
        else:
            xs.append(fp.from_int(p[0]))
            ys.append(fp.from_int(p[1]))
            zs.append(fp.from_int(1))
    return (np.stack(xs), np.stack(ys), np.stack(zs))


def _from_proj(fp, res, i):
    X = fp.to_int(np.asarray(res[0])[i])
    Y = fp.to_int(np.asarray(res[1])[i])
    Z = fp.to_int(np.asarray(res[2])[i])
    if Z == 0:
        return None
    zi = gf.fp_inv(Z)
    return (X * zi % P_MOD, Y * zi % P_MOD)


def test_proj_add_all_exceptional_cases():
    fp = fp_spec()
    pts = _pts(6)
    neg2 = (pts[2][0], (P_MOD - pts[2][1]) % P_MOD)
    # pairs: generic, doubling, inverse (-> inf), inf+P, P+inf, inf+inf
    lhs = [pts[0], pts[1], pts[2], None, pts[4], None]
    rhs = [pts[3], pts[1], neg2, pts[5], None, None]
    want = [gc.g1_add(a, b) for a, b in zip(lhs, rhs)]
    p1 = _to_proj(fp, lhs)
    p2 = _to_proj(fp, rhs)
    with jax.default_device(CPU):
        res = jax.jit(lambda a, b: proj.add(fp, a, b))(p1, p2)
    for i in range(len(lhs)):
        assert _from_proj(fp, res, i) == want[i], f"case {i}"


def test_proj_add_mixed_matches_full():
    fp = fp_spec()
    pts = _pts(5, secret=91)
    neg0 = (pts[0][0], (P_MOD - pts[0][1]) % P_MOD)
    lhs = [pts[0], pts[1], None, pts[0]]
    rhs = [pts[2], pts[1], pts[3], neg0]      # generic, double, inf+P, ->inf
    want = [gc.g1_add(a, b) for a, b in zip(lhs, rhs)]
    p1 = _to_proj(fp, lhs)
    ax = np.stack([fp.from_int(p[0]) for p in rhs])
    ay = np.stack([fp.from_int(p[1]) for p in rhs])
    with jax.default_device(CPU):
        res = jax.jit(lambda p, x, y: proj.add_mixed(fp, p, (x, y)))(
            p1, ax, ay)
    for i in range(len(lhs)):
        assert _from_proj(fp, res, i) == want[i], f"case {i}"


def test_proj_tree_add_and_jacobian_bridge():
    fp = fp_spec()
    curve = CurveOps(fp)
    pts = _pts(7, secret=19)
    want = None
    for p in pts:
        want = gc.g1_add(want, p)
    pp = _to_proj(fp, pts)
    with jax.default_device(CPU):
        def run(p):
            s = proj.tree_add(fp, p, axis_from_end=0)
            jac = proj.to_jacobian(fp, s)
            return curve.to_affine(tuple(c[None] for c in jac))
        ax, ay, ainf = jax.jit(run)(pp)
    assert not bool(np.asarray(ainf)[0])
    got = (fp.to_int(np.asarray(ax)[0]), fp.to_int(np.asarray(ay)[0]))
    assert got == want
