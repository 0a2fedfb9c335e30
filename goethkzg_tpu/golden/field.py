"""Golden (pure-Python big-int) field arithmetic for BLS12-381.

This is the slow, obviously-correct oracle used by differential tests and by
host-side cold paths (setup parsing, wire-point decompression).  The TPU limb
kernels in `ops/` are validated bit-exactly against this module.

Fp2 elements are tuples (c0, c1) representing c0 + c1*u with u^2 = -1.
Fp6 elements are 3-tuples of Fp2 over v with v^3 = u + 1.
Fp12 elements are 2-tuples of Fp6 over w with w^2 = v.

Reference behavior: gnark-crypto field semantics as used by the reference
library (SURVEY.md §2.4).
"""

from ..constants import P_MOD, R_MOD

P = P_MOD
R = R_MOD


# ---------------------------------------------------------------------------
# Fp / Fr (plain ints)
# ---------------------------------------------------------------------------
def fp_inv(a: int) -> int:
    return pow(a, P - 2, P)


def fr_inv(a: int) -> int:
    return pow(a, R_MOD - 2, R_MOD)


def fp_sqrt(a: int):
    """Square root in Fp (p ≡ 3 mod 4). Returns None if a is not a QR."""
    s = pow(a, (P + 1) // 4, P)
    if s * s % P != a % P:
        return None
    return s


# ---------------------------------------------------------------------------
# Fp2
# ---------------------------------------------------------------------------
FP2_ZERO = (0, 0)
FP2_ONE = (1, 0)


def fp2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fp2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fp2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fp2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 - a1 * b1) % P, (a0 * b1 + a1 * b0) % P)


def fp2_sqr(a):
    a0, a1 = a
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    return ((a0 + a1) * (a0 - a1) % P, 2 * a0 * a1 % P)


def fp2_mul_scalar(a, k: int):
    return (a[0] * k % P, a[1] * k % P)


def fp2_inv(a):
    a0, a1 = a
    norm_inv = fp_inv((a0 * a0 + a1 * a1) % P)
    return (a0 * norm_inv % P, (-a1) * norm_inv % P)


def fp2_conj(a):
    return (a[0], (-a[1]) % P)


def fp2_mul_by_nonresidue(a):
    """Multiply by (1 + u), the cubic non-residue defining Fp6."""
    a0, a1 = a
    return ((a0 - a1) % P, (a0 + a1) % P)


def fp2_is_zero(a):
    return a[0] % P == 0 and a[1] % P == 0


def fp2_eq(a, b):
    return a[0] % P == b[0] % P and a[1] % P == b[1] % P


def fp2_sqrt(a):
    """Square root in Fp2, None if not a QR.

    Uses the norm trick: for a = a0 + a1 u with u^2 = -1,
    candidates x = x0 + x1 u satisfy x0^2 = (a0 ± sqrt(a0^2+a1^2))/2.
    """
    a0, a1 = a[0] % P, a[1] % P
    if a1 == 0:
        s = fp_sqrt(a0)
        if s is not None:
            return (s, 0)
        # a0 is a non-residue; sqrt is purely imaginary: (x1 u)^2 = -x1^2
        s = fp_sqrt((-a0) % P)
        if s is None:
            return None
        return (0, s)
    n = fp_sqrt((a0 * a0 + a1 * a1) % P)
    if n is None:
        return None
    inv2 = fp_inv(2)
    for cand in ((a0 + n) * inv2 % P, (a0 - n) * inv2 % P):
        x0 = fp_sqrt(cand)
        if x0 is None or x0 == 0:
            continue
        x1 = a1 * fp_inv(2 * x0 % P) % P
        if fp2_eq(fp2_sqr((x0, x1)), (a0, a1)):
            return (x0, x1)
    return None


# ---------------------------------------------------------------------------
# Fp6 = Fp2[v] / (v^3 - (1+u))
# ---------------------------------------------------------------------------
FP6_ZERO = (FP2_ZERO, FP2_ZERO, FP2_ZERO)
FP6_ONE = (FP2_ONE, FP2_ZERO, FP2_ZERO)


def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def fp6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(t0, fp2_mul_by_nonresidue(
        fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), fp2_add(t1, t2))))
    c1 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), fp2_add(t0, t1)),
        fp2_mul_by_nonresidue(t2))
    c2 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), fp2_add(t0, t2)),
        t1)
    return (c0, c1, c2)


def fp6_sqr(a):
    return fp6_mul(a, a)


def fp6_mul_by_nonresidue(a):
    """Multiply by v: (a0, a1, a2) -> (a2*(1+u), a0, a1)."""
    return (fp2_mul_by_nonresidue(a[2]), a[0], a[1])


def fp6_inv(a):
    a0, a1, a2 = a
    t0 = fp2_sqr(a0)
    t1 = fp2_sqr(a1)
    t2 = fp2_sqr(a2)
    t3 = fp2_mul(a0, a1)
    t4 = fp2_mul(a0, a2)
    t5 = fp2_mul(a1, a2)
    c0 = fp2_sub(t0, fp2_mul_by_nonresidue(t5))
    c1 = fp2_sub(fp2_mul_by_nonresidue(t2), t3)
    c2 = fp2_sub(t1, t4)
    t6 = fp2_add(fp2_mul(a0, c0),
                 fp2_mul_by_nonresidue(fp2_add(fp2_mul(a2, c1), fp2_mul(a1, c2))))
    t6_inv = fp2_inv(t6)
    return (fp2_mul(c0, t6_inv), fp2_mul(c1, t6_inv), fp2_mul(c2, t6_inv))


# ---------------------------------------------------------------------------
# Fp12 = Fp6[w] / (w^2 - v)
# ---------------------------------------------------------------------------
FP12_ONE = (FP6_ONE, FP6_ZERO)


def fp12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fp6_mul(a0, b0)
    t1 = fp6_mul(a1, b1)
    c0 = fp6_add(t0, fp6_mul_by_nonresidue(t1))
    c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(b0, b1)), t0), t1)
    return (c0, c1)


def fp12_sqr(a):
    return fp12_mul(a, a)


def fp12_inv(a):
    a0, a1 = a
    t = fp6_inv(fp6_sub(fp6_sqr(a0), fp6_mul_by_nonresidue(fp6_sqr(a1))))
    return (fp6_mul(a0, t), fp6_neg(fp6_mul(a1, t)))


def fp12_conj(a):
    return (a[0], fp6_neg(a[1]))


def fp12_eq_one(a):
    c0, c1 = a
    return (fp2_eq(c0[0], FP2_ONE) and fp2_is_zero(c0[1]) and fp2_is_zero(c0[2])
            and all(fp2_is_zero(x) for x in c1))


def fp12_pow(a, e: int):
    result = FP12_ONE
    base = a
    while e > 0:
        if e & 1:
            result = fp12_mul(result, base)
        base = fp12_sqr(base)
        e >>= 1
    return result


# Frobenius: x -> x^p on the tower.
# gamma constants: gamma1[i] = (1+u)^((p-1)*i/6) etc.  We compute them once.
def _compute_frob_coeffs():
    # (1+u)^((p^k - 1) / 6) for k = 1, 2, 3 expressed via exponentiation in Fp2
    def fp2_pow(a, e):
        result = FP2_ONE
        base = a
        while e > 0:
            if e & 1:
                result = fp2_mul(result, base)
            base = fp2_sqr(base)
            e >>= 1
        return result

    xi = (1, 1)
    g1 = [fp2_pow(xi, i * (P - 1) // 6) for i in range(6)]
    g2 = [fp2_pow(xi, i * (P * P - 1) // 6) for i in range(6)]
    g3 = [fp2_pow(xi, i * (P * P * P - 1) // 6) for i in range(6)]
    return g1, g2, g3


_G1_FROB, _G2_FROB, _G3_FROB = _compute_frob_coeffs()


def fp12_frobenius(a, power: int = 1):
    """x -> x^(p^power) for power in {1, 2, 3}."""
    g = {1: _G1_FROB, 2: _G2_FROB, 3: _G3_FROB}[power]

    def conj_k(x):
        return fp2_conj(x) if power % 2 == 1 else x

    c0, c1 = a
    c00, c01, c02 = (conj_k(x) for x in c0)
    c10, c11, c12 = (conj_k(x) for x in c1)
    return (
        (c00, fp2_mul(c01, g[2]), fp2_mul(c02, g[4])),
        (fp2_mul(c10, g[1]), fp2_mul(c11, g[3]), fp2_mul(c12, g[5])),
    )
