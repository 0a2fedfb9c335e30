"""TPU-native optimal-ate pairing check for BLS12-381.

Replaces gnark's PairingCheck on the verify hot paths (reference:
internal/kzg/kzg_verify.go:88,190 and internal/kzg_multi/kzg_verify.go:94 —
only *products of two pairings compared against 1* are ever needed).

Design:
* G2 arithmetic runs on the twist in Fp2 Jacobian coordinates using the
  same branchless `CurveOps` kernels as G1;
* line functions are evaluated inversion-free: every denominator is an
  Fp2 scalar and proper-subfield factors vanish under the final
  exponentiation, so lines are scaled instead of divided.  The untwist
  (x, y) -> (x w^-2, y w^-3), w^6 = 1+u places a line at Fp12 basis
  positions {1, v*w, v^2*w} ("sparse 0-3-5" shape);
* the Miller loop is a 63-step `lax.scan` over the bits of the (negative)
  BLS parameter, with the rare addition steps computed always and masked;
* the final exponentiation uses the cubic-multiple decomposition
  3*(p^4-p^2+1)/r = (u-1)^2 (u+p)(u^2+p^2-1) + 3, checking f^(3d) == 1
  (equivalent to f^d == 1 since gcd(3, r) = 1), so the hard part is three
  fixed-exponent scans and a few Frobenius maps.

Validated bit-exactly against the golden host pairing.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BLS_X, P_MOD
from ..golden import field as gfield
from .curve import CurveOps
from .field import fp_spec
from .field2 import fp2_field

P = P_MOD


# ---------------------------------------------------------------------------
# Fp6 / Fp12 tower over device Fp2 (tuples as pytrees)
# ---------------------------------------------------------------------------
class Tower:
    def __init__(self):
        self.f2 = fp2_field()
        self.fp = fp_spec()

    # Fp6 = (c0, c1, c2) over Fp2, v^3 = 1+u
    def f6_add(self, a, b):
        return tuple(self.f2.add(x, y) for x, y in zip(a, b))

    def f6_sub(self, a, b):
        return tuple(self.f2.sub(x, y) for x, y in zip(a, b))

    def f6_neg(self, a):
        return tuple(self.f2.neg(x) for x in a)

    def f6_mul(self, a, b):
        f2 = self.f2
        a0, a1, a2 = a
        b0, b1, b2 = b
        t0 = f2.mul(a0, b0)
        t1 = f2.mul(a1, b1)
        t2 = f2.mul(a2, b2)
        c0 = f2.add(t0, f2.mul_by_nonresidue(
            f2.sub(f2.mul(f2.add(a1, a2), f2.add(b1, b2)), f2.add(t1, t2))))
        c1 = f2.add(
            f2.sub(f2.mul(f2.add(a0, a1), f2.add(b0, b1)), f2.add(t0, t1)),
            f2.mul_by_nonresidue(t2))
        c2 = f2.add(
            f2.sub(f2.mul(f2.add(a0, a2), f2.add(b0, b2)), f2.add(t0, t2)), t1)
        return (c0, c1, c2)

    def f6_mul_by_nonresidue(self, a):
        return (self.f2.mul_by_nonresidue(a[2]), a[0], a[1])

    def f6_inv(self, a):
        f2 = self.f2
        a0, a1, a2 = a
        t0, t1, t2 = f2.sqr(a0), f2.sqr(a1), f2.sqr(a2)
        t3, t4, t5 = f2.mul(a0, a1), f2.mul(a0, a2), f2.mul(a1, a2)
        c0 = f2.sub(t0, f2.mul_by_nonresidue(t5))
        c1 = f2.sub(f2.mul_by_nonresidue(t2), t3)
        c2 = f2.sub(t1, t4)
        t6 = f2.add(f2.mul(a0, c0), f2.mul_by_nonresidue(
            f2.add(f2.mul(a2, c1), f2.mul(a1, c2))))
        t6i = f2.inv(t6)
        return (f2.mul(c0, t6i), f2.mul(c1, t6i), f2.mul(c2, t6i))

    def f6_zero_like(self, a):
        return tuple(jnp.zeros_like(x) for x in a)

    # Fp12 = (c0, c1) over Fp6, w^2 = v
    def f12_mul(self, a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = self.f6_mul(a0, b0)
        t1 = self.f6_mul(a1, b1)
        c0 = self.f6_add(t0, self.f6_mul_by_nonresidue(t1))
        c1 = self.f6_sub(
            self.f6_sub(self.f6_mul(self.f6_add(a0, a1), self.f6_add(b0, b1)),
                        t0), t1)
        return (c0, c1)

    def f12_sqr(self, a):
        return self.f12_mul(a, a)

    def f12_conj(self, a):
        return (a[0], self.f6_neg(a[1]))

    def f12_inv(self, a):
        a0, a1 = a
        t = self.f6_inv(self.f6_sub(self.f6_mul(a0, a0),
                                    self.f6_mul_by_nonresidue(
                                        self.f6_mul(a1, a1))))
        return (self.f6_mul(a0, t), self.f6_neg(self.f6_mul(a1, t)))

    def f12_select(self, cond, a, b):
        f2 = self.f2
        return tuple(
            tuple(f2.select(cond, x, y) for x, y in zip(c6a, c6b))
            for c6a, c6b in zip(a, b))

    def f12_one(self, batch_shape=()):
        f2 = self.f2
        one = jnp.broadcast_to(f2.one_elem, batch_shape + f2.one_elem.shape)
        zero = jnp.zeros_like(one)
        return ((one, zero, zero), (zero, zero, zero))

    def f12_is_one(self, a):
        f2 = self.f2
        c0, c1 = a
        ok = f2.eq(c0[0], jnp.broadcast_to(f2.one_elem, c0[0].shape))
        for x in (c0[1], c0[2], *c1):
            ok = ok & f2.is_zero(x)
        return ok

    def f12_pow_const(self, a, exponent: int):
        """a^exponent via scan over fixed bits (MSB first)."""
        nbits = max(exponent.bit_length(), 1)
        bits = np.asarray(
            [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=np.uint32)

        def body(acc, bit):
            s = self.f12_sqr(acc)
            sm = self.f12_mul(s, a)
            return self.f12_select(bit == 1, sm, s), None

        batch = a[0][0].shape[:-2]
        out, _ = jax.lax.scan(body, self.f12_one(batch), bits)
        return out


@functools.cache
def get_tower() -> Tower:
    return Tower()


# Frobenius gamma constants (from the golden model, uploaded once)
@functools.cache
def _frob_tables():
    f2 = fp2_field()
    g1, g2, g3 = gfield._G1_FROB, gfield._G2_FROB, gfield._G3_FROB
    to_dev = lambda tbl: [f2.from_ints(c) for c in tbl]
    return to_dev(g1), to_dev(g2), to_dev(g3)


def f12_frobenius(tw: Tower, a, power: int):
    g1, g2, g3 = _frob_tables()
    g = {1: g1, 2: g2, 3: g3}[power]
    f2 = tw.f2
    conj = (lambda x: f2.conj(x)) if power % 2 == 1 else (lambda x: x)
    c0, c1 = a
    return (
        (conj(c0[0]), f2.mul(conj(c0[1]), g[2]), f2.mul(conj(c0[2]), g[4])),
        (f2.mul(conj(c1[0]), g[1]), f2.mul(conj(c1[1]), g[3]),
         f2.mul(conj(c1[2]), g[5])),
    )


# ---------------------------------------------------------------------------
# Miller loop
# ---------------------------------------------------------------------------
_XI_INT = (1, 1)  # 1 + u


def _sparse_line_mul(tw: Tower, f, A, B, C):
    """f * (A + B*v*w + C*v^2*w) with A, B, C in Fp2.

    The line element is l = (l0, l1) with l0 = (A, 0, 0), l1 = (0, B, C).
    """
    zero = jnp.zeros_like(A)
    l = ((A, zero, zero), (zero, B, C))
    return tw.f12_mul(f, l)


def _line_double(tw: Tower, curve2, T, xp_fp, yp_fp):
    """Tangent line at psi(T) evaluated at P=(xp, yp), T Jacobian on twist.

    Returns (A, B, C) Fp2 line coefficients and 2T.
      A = 2 Y Z^3 yp * xi ;  B = 3 X^3 - 2 Y^2 ;  C = -3 X^2 Z^2 xp.
    """
    f2 = tw.f2
    X, Y, Z = T
    Z2 = f2.sqr(Z)
    Z3 = f2.mul(Z2, Z)
    X2 = f2.sqr(X)
    X3 = f2.mul(X2, X)
    Y2 = f2.sqr(Y)
    YZ3 = f2.mul(Y, Z3)
    X2Z2 = f2.mul(X2, Z2)
    xi = f2.from_ints(_XI_INT)
    A = f2.mul(f2.mul_scalar_fp(f2.add(YZ3, YZ3), yp_fp), xi)
    three_x3 = f2.add(f2.add(X3, X3), X3)
    B = f2.sub(three_x3, f2.add(Y2, Y2))
    three_x2z2 = f2.add(f2.add(X2Z2, X2Z2), X2Z2)
    C = f2.neg(f2.mul_scalar_fp(three_x2z2, xp_fp))
    T2 = curve2.double(T)
    return (A, B, C), T2


def _line_add(tw: Tower, curve2, T, Q_aff, xp_fp, yp_fp):
    """Line through psi(T), psi(Q) at P; returns (A, B, C) and T+Q.

    theta = Y - yQ Z^3 ; pi = X - xQ Z^2  (lambda' = theta / (pi * Z))
      A = pi * Z * yp * xi ; B = theta xQ - pi Z yQ ; C = -theta xp.
    """
    f2 = tw.f2
    X, Y, Z = T
    xq, yq = Q_aff
    Z2 = f2.sqr(Z)
    Z3 = f2.mul(Z2, Z)
    theta = f2.sub(Y, f2.mul(yq, Z3))
    pi = f2.sub(X, f2.mul(xq, Z2))
    piZ = f2.mul(pi, Z)
    xi = f2.from_ints(_XI_INT)
    A = f2.mul(f2.mul_scalar_fp(piZ, yp_fp), xi)
    B = f2.sub(f2.mul(theta, xq), f2.mul(piZ, yq))
    C = f2.neg(f2.mul_scalar_fp(theta, xp_fp))
    T2 = curve2.add_affine(T, Q_aff)
    return (A, B, C), T2


def miller_pair(tw: Tower, p_aff, q_aff, valid):
    """Miller loop f_{x,Q}(P) for one pair; `valid` masks the pair to 1.

    p_aff: (xp, yp) Fp limbs; q_aff: (xq, yq) Fp2 limbs (twist coords).
    Conjugated at the end (BLS x is negative).
    """
    f2 = tw.f2
    curve2 = CurveOps(f2)
    xp, yp = p_aff
    one2 = jnp.broadcast_to(f2.one_elem, q_aff[0].shape)
    T = (q_aff[0], q_aff[1], one2)

    bits = np.asarray(
        [int(b) for b in bin(BLS_X)[3:]], dtype=np.uint32)  # skip leading 1
    f0 = tw.f12_one(xp.shape[:-1])

    def body(state, bit):
        f, T = state
        f = tw.f12_sqr(f)
        (A, B, C), T2 = _line_double(tw, curve2, T, xp, yp)
        f = _sparse_line_mul(tw, f, A, B, C)
        (A2, B2, C2), T3 = _line_add(tw, curve2, T2, q_aff, xp, yp)
        fa = _sparse_line_mul(tw, f, A2, B2, C2)
        take = bit == 1
        f = tw.f12_select(take, fa, f)
        T = curve2.select(take, T3, T2)
        return (f, T), None

    (f, _), _ = jax.lax.scan(body, (f0, T), bits)
    f = tw.f12_conj(f)
    return tw.f12_select(valid, f, tw.f12_one(xp.shape[:-1]))


def pairing_check_2(tw: Tower, p1, q1, v1, p2, q2, v2):
    """prod of two pairings == 1?  (device bool).

    p*: (x, y) Fp limb arrays; q*: (x, y) Fp2 limb arrays; v*: validity
    masks (False => that pair contributes the identity, matching gnark's
    infinity handling).
    """
    f = tw.f12_mul(miller_pair(tw, p1, q1, v1), miller_pair(tw, p2, q2, v2))
    return final_exp_is_one(tw, f)


def final_exp_is_one(tw: Tower, f):
    """Check f^((p^12-1)/r) == 1 via the 3x-multiple hard part."""
    # easy part: f^((p^6-1)(p^2+1))
    f = tw.f12_mul(tw.f12_conj(f), tw.f12_inv(f))
    f = tw.f12_mul(f12_frobenius(tw, f, 2), f)
    # hard part (times 3): with u = -x,
    #   3d = (u-1)^2 (u+p) (u^2+p^2-1) + 3
    x = BLS_X
    g = tw.f12_pow_const(f, (x + 1) ** 2)         # f^((u-1)^2), u-1 = -(x+1)
    # h = g^(u+p) = conj(g^x) * frob(g)
    h = tw.f12_mul(tw.f12_conj(tw.f12_pow_const(g, x)), f12_frobenius(tw, g, 1))
    # k = h^(u^2 + p^2 - 1) = h^(x^2) * frob2(h) * conj(h)
    k = tw.f12_mul(
        tw.f12_mul(tw.f12_pow_const(h, x * x), f12_frobenius(tw, h, 2)),
        tw.f12_conj(h))
    # f^(3d) = k * f^3
    f3 = tw.f12_mul(tw.f12_sqr(f), f)
    res = tw.f12_mul(k, f3)
    return tw.f12_is_one(res)
