"""Limb-major RCB complete projective group law for inside Pallas kernels.

Mirrors ops/proj.py exactly (bit-identical results) but operates on
limb-major [n, B] tiles with the _mont_mul_lm / _mod_add_lm helpers of
ops/pallas_curve.py, for use inside kernel bodies.  One code path for
add/double/infinity; a complete mixed add is 11 Montgomery muls + 2
four-add b3 chains, vs ~19 muls for the branch-blended Jacobian law.
"""

from .pallas_curve import _mod_add_lm, _mod_sub_lm, _mont_mul_lm


def _mul12_lm(v, modc):
    v2 = _mod_add_lm(v, v, modc)
    v4 = _mod_add_lm(v2, v2, modc)
    v8 = _mod_add_lm(v4, v4, modc)
    return _mod_add_lm(v8, v4, modc)


def proj_add_mixed_lm(X1, Y1, Z1, x2, y2, modc, npc, n):
    """Complete (X1:Y1:Z1) + affine (x2, y2); a=0, b3=12 (RCB15 alg. 8).

    x2/y2 must be a real point (not infinity) — mask such lanes outside.
    """
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    add = lambda u, v: _mod_add_lm(u, v, modc)
    sub = lambda u, v: _mod_sub_lm(u, v, modc)
    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = mul(add(X1, Y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = add(mul(y2, Z1), Y1)
    Y3 = add(mul(x2, Z1), X1)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = _mul12_lm(Z1, modc)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _mul12_lm(Y3, modc)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = mul(Y3, t0)
    Y3 = add(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add(mul(Z3, t4), t0)
    return X3, Y3, Z3


def proj_add_lm(X1, Y1, Z1, X2, Y2, Z2, modc, npc, n):
    """Complete projective add (RCB15 alg. 7, a=0, b3=12): 12M + 2*b3."""
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    add = lambda u, v: _mod_add_lm(u, v, modc)
    sub = lambda u, v: _mod_sub_lm(u, v, modc)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    Y3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(Y3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = _mul12_lm(t2, modc)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _mul12_lm(Y3, modc)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = mul(Y3, t0)
    Y3 = add(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add(mul(Z3, t4), t0)
    return X3, Y3, Z3
