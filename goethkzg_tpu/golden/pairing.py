"""Golden (pure-Python) optimal-ate pairing on BLS12-381.

Deliberately simple and obviously-correct: the Miller loop is run with
generic line functions over full Fp12 arithmetic (G2 points are untwisted
into E(Fp12)), and the hard part of the final exponentiation is a plain
exponentiation by (p^4 - p^2 + 1)//r.  This is the oracle the fast device
pairing (ops/pairing.py) is validated against.

Mirrors the reference's use of gnark PairingCheck
(reference: internal/kzg/kzg_verify.go:88, internal/kzg_multi/kzg_verify.go:94):
only products of pairings compared against 1 are ever needed.
"""

from ..constants import BLS_X, P_MOD
from . import field as gf

P = P_MOD

# Fp12 element for w (the generator of Fp12 over Fp6)
_W = (gf.FP6_ZERO, gf.FP6_ONE)
_W2 = gf.fp12_mul(_W, _W)
_W3 = gf.fp12_mul(_W2, _W)
_W2_INV = gf.fp12_inv(_W2)
_W3_INV = gf.fp12_inv(_W3)

_HARD_PART_EXP = (P**4 - P**2 + 1) // __import__(
    "goethkzg_tpu.constants", fromlist=["R_MOD"]).R_MOD


def _fp12_from_fp(a: int):
    return ((( a % P, 0), gf.FP2_ZERO, gf.FP2_ZERO), gf.FP6_ZERO)


def _fp12_from_fp2(a):
    return ((a, gf.FP2_ZERO, gf.FP2_ZERO), gf.FP6_ZERO)


def _untwist(q):
    """Map a G2 point (Fp2 affine) to E(Fp12): (x w^-2, y w^-3)."""
    x, y = q
    X = gf.fp12_mul(_fp12_from_fp2(x), _W2_INV)
    Y = gf.fp12_mul(_fp12_from_fp2(y), _W3_INV)
    return (X, Y)


def _fp12_sub(a, b):
    return (gf.fp6_sub(a[0], b[0]), gf.fp6_sub(a[1], b[1]))


def _line(A, B, xp, yp):
    """Evaluate the line through A and B (E(Fp12) affine points) at (xp, yp).

    Returns the Fp12 value (yp - ay) - lambda * (xp - ax).  Verticals return
    (xp - ax); they get eliminated by the final exponentiation anyway.
    """
    ax, ay = A
    bx, by = B
    if ax == bx and ay == by:
        # tangent: lambda = 3 ax^2 / (2 ay)
        num = gf.fp12_mul(_fp12_from_fp(3), gf.fp12_sqr(ax))
        den = gf.fp12_mul(_fp12_from_fp(2), ay)
    elif ax == bx:
        # vertical line x = ax
        return _fp12_sub(xp, ax)
    else:
        num = _fp12_sub(by, ay)
        den = _fp12_sub(bx, ax)
    lam = gf.fp12_mul(num, gf.fp12_inv(den))
    return _fp12_sub(_fp12_sub(yp, ay), gf.fp12_mul(lam, _fp12_sub(xp, ax)))


def _ec_fp12_add(A, B):
    """Affine addition on E(Fp12) (b=4). None = infinity."""
    if A is None:
        return B
    if B is None:
        return A
    ax, ay = A
    bx, by = B
    if ax == bx:
        if ay == by:
            if ay == _fp12_from_fp(0):
                return None
            num = gf.fp12_mul(_fp12_from_fp(3), gf.fp12_sqr(ax))
            den = gf.fp12_mul(_fp12_from_fp(2), ay)
        else:
            return None
    else:
        num = _fp12_sub(by, ay)
        den = _fp12_sub(bx, ax)
    lam = gf.fp12_mul(num, gf.fp12_inv(den))
    cx = _fp12_sub(_fp12_sub(gf.fp12_sqr(lam), ax), bx)
    cy = _fp12_sub(gf.fp12_mul(lam, _fp12_sub(ax, cx)), ay)
    return (cx, cy)


def miller_loop(p1, q2):
    """Miller loop f_{x,Q}(P) for P in G1 affine, Q in G2 affine (both non-inf)."""
    xp = _fp12_from_fp(p1[0])
    yp = _fp12_from_fp(p1[1])
    Q = _untwist(q2)
    T = Q
    f = gf.FP12_ONE
    bits = bin(BLS_X)[3:]  # skip the leading 1
    for bit in bits:
        f = gf.fp12_mul(gf.fp12_sqr(f), _line(T, T, xp, yp))
        T = _ec_fp12_add(T, T)
        if bit == "1":
            f = gf.fp12_mul(f, _line(T, Q, xp, yp))
            T = _ec_fp12_add(T, Q)
    # BLS parameter x is negative: f_{-x} = conj(f_x) up to final exp
    return gf.fp12_conj(f)


def final_exponentiation(f):
    # easy part: f^((p^6-1)(p^2+1))
    f = gf.fp12_mul(gf.fp12_conj(f), gf.fp12_inv(f))
    f = gf.fp12_mul(gf.fp12_frobenius(f, 2), f)
    # hard part (naive full exponentiation — oracle for the fast path)
    return gf.fp12_pow(f, _HARD_PART_EXP)


def final_exp_is_one_fast(f) -> bool:
    """Check f^((p^12-1)/r) == 1 via 3d = (u-1)^2 (u+p)(u^2+p^2-1) + 3.

    Equivalent to the full check since gcd(3, r) = 1 (an identity-tested
    decomposition; u = -BLS_X).  After the easy part all elements are in
    the cyclotomic subgroup, where inversion is conjugation.
    """
    x = BLS_X
    f = gf.fp12_mul(gf.fp12_conj(f), gf.fp12_inv(f))
    f = gf.fp12_mul(gf.fp12_frobenius(f, 2), f)
    g = gf.fp12_pow(f, (x + 1) ** 2)
    h = gf.fp12_mul(gf.fp12_conj(gf.fp12_pow(g, x)), gf.fp12_frobenius(g, 1))
    k = gf.fp12_mul(gf.fp12_mul(gf.fp12_pow(h, x * x),
                                gf.fp12_frobenius(h, 2)), gf.fp12_conj(h))
    res = gf.fp12_mul(k, gf.fp12_mul(gf.fp12_sqr(f), f))
    return gf.fp12_eq_one(res)


def pairing_check(pairs, fast: bool = True) -> bool:
    """Return True iff prod e(P_i, Q_i) == 1.

    pairs: iterable of (g1_affine, g2_affine); entries with an infinity
    member contribute the identity (matching gnark PairingCheck).
    """
    f = gf.FP12_ONE
    for p1, q2 in pairs:
        if p1 is None or q2 is None:
            continue
        f = gf.fp12_mul(f, miller_loop(p1, q2))
    if fast:
        return final_exp_is_one_fast(f)
    return gf.fp12_eq_one(final_exponentiation(f))
