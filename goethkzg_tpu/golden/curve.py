"""Golden (pure-Python) BLS12-381 group operations and point (de)serialization.

Implements the ZCash compressed-point wire format with the exact validation
semantics of gnark's SetBytes as used by the reference
(reference: serialization.go:102-131, trusted_setup.go:102-134):
on-curve check always; subgroup check optional (skipped for trusted-setup
points, required for wire points).

Points are represented as affine tuples: G1 = (x, y) ints, infinity = None.
G2 = ((x0,x1), (y0,y1)) Fp2 tuples, infinity = None.
"""

from ..constants import (G1_B, G1_GEN_X, G1_GEN_Y, G2_GEN_X, G2_GEN_Y, P_MOD,
                         R_MOD)
from . import field as gf

P = P_MOD


class DeserializationError(ValueError):
    """Raised when a wire point/scalar fails validation."""


# ---------------------------------------------------------------------------
# Generic Jacobian arithmetic parameterized over the field
# ---------------------------------------------------------------------------
class _FpOps:
    add = staticmethod(lambda a, b: (a + b) % P)
    sub = staticmethod(lambda a, b: (a - b) % P)
    mul = staticmethod(lambda a, b: (a * b) % P)
    sqr = staticmethod(lambda a: (a * a) % P)
    neg = staticmethod(lambda a: (-a) % P)
    is_zero = staticmethod(lambda a: a % P == 0)
    zero = 0
    one = 1


class _Fp2Ops:
    add = staticmethod(gf.fp2_add)
    sub = staticmethod(gf.fp2_sub)
    mul = staticmethod(gf.fp2_mul)
    sqr = staticmethod(gf.fp2_sqr)
    neg = staticmethod(gf.fp2_neg)
    is_zero = staticmethod(gf.fp2_is_zero)
    zero = gf.FP2_ZERO
    one = gf.FP2_ONE


def _jac_double(F, pt):
    if pt is None:
        return None
    X, Y, Z = pt
    if F.is_zero(Y):
        return None
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    D = F.sub(F.sub(F.sqr(F.add(X, B)), A), C)
    D = F.add(D, D)
    E = F.add(F.add(A, A), A)
    Fv = F.sqr(E)
    X3 = F.sub(Fv, F.add(D, D))
    C8 = F.add(F.add(F.add(C, C), F.add(C, C)), F.add(F.add(C, C), F.add(C, C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    Z3 = F.mul(F.add(Y, Y), Z)
    return (X3, Y3, Z3)


def _jac_add(F, p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    if U1 == U2:
        if S1 == S2:
            return _jac_double(F, p1)
        return None
    H = F.sub(U2, U1)
    I = F.sqr(F.add(H, H))
    J = F.mul(H, I)
    r = F.sub(S2, S1)
    r = F.add(r, r)
    V = F.mul(U1, I)
    X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(F.mul(S1, J), F.mul(S1, J)))
    Z3 = F.mul(F.mul(Z1, Z2), F.add(H, H))
    return (X3, Y3, Z3)


def _to_jac(pt):
    if pt is None:
        return None
    x, y = pt
    return (x, y, 1 if not isinstance(x, tuple) else gf.FP2_ONE)


def _from_jac(F, pt):
    if pt is None:
        return None
    X, Y, Z = pt
    if F.is_zero(Z):
        return None
    if isinstance(Z, tuple):
        zinv = gf.fp2_inv(Z)
    else:
        zinv = gf.fp_inv(Z)
    zinv2 = F.sqr(zinv)
    zinv3 = F.mul(zinv2, zinv)
    return (F.mul(X, zinv2), F.mul(Y, zinv3))


def _scalar_mul(F, pt, k: int):
    if k < 0:
        raise ValueError("negative scalar")
    if pt is None or k == 0:
        return None
    acc = None
    base = _to_jac(pt)
    while k:
        if k & 1:
            acc = _jac_add(F, acc, base)
        base = _jac_double(F, base)
        k >>= 1
    return _from_jac(F, acc)


# G1 public helpers ---------------------------------------------------------
def g1_add(p1, p2):
    return _from_jac(_FpOps, _jac_add(_FpOps, _to_jac(p1), _to_jac(p2)))


def g1_neg(p):
    return None if p is None else (p[0], (-p[1]) % P)


def g1_scalar_mul(p, k: int):
    return _scalar_mul(_FpOps, p, k)


def g1_generator():
    return (G1_GEN_X, G1_GEN_Y)


def g1_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - (x * x * x + G1_B)) % P == 0


def g1_in_subgroup(p) -> bool:
    return g1_scalar_mul(p, R_MOD) is None


def g2_add(p1, p2):
    return _from_jac(_Fp2Ops, _jac_add(_Fp2Ops, _to_jac(p1), _to_jac(p2)))


def g2_neg(p):
    return None if p is None else (p[0], gf.fp2_neg(p[1]))


def g2_scalar_mul(p, k: int):
    return _scalar_mul(_Fp2Ops, p, k)


def g2_generator():
    return (G2_GEN_X, G2_GEN_Y)


def g2_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    b = (4, 4)
    lhs = gf.fp2_sqr(y)
    rhs = gf.fp2_add(gf.fp2_mul(gf.fp2_sqr(x), x), b)
    return gf.fp2_eq(lhs, rhs)


def g2_in_subgroup(p) -> bool:
    return g2_scalar_mul(p, R_MOD) is None


# ---------------------------------------------------------------------------
# Compressed serialization (ZCash format, gnark SetBytes semantics)
# ---------------------------------------------------------------------------
_COMPRESSED_FLAG = 0x80
_INFINITY_FLAG = 0x40
_Y_LARGEST_FLAG = 0x20


def _y_is_lexicographically_largest_fp(y: int) -> bool:
    return y > (P - 1) // 2


def _y_is_lexicographically_largest_fp2(y) -> bool:
    y0, y1 = y
    if y1 != 0:
        return y1 > (P - 1) // 2
    return y0 > (P - 1) // 2


def g1_compress(p) -> bytes:
    if p is None:
        return bytes([_COMPRESSED_FLAG | _INFINITY_FLAG] + [0] * 47)
    x, y = p
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= _COMPRESSED_FLAG
    if _y_is_lexicographically_largest_fp(y):
        out[0] |= _Y_LARGEST_FLAG
    return bytes(out)


def g1_decompress(data: bytes, subgroup_check: bool = True):
    """Decompress a 48-byte G1 point. Raises DeserializationError on failure."""
    if len(data) != 48:
        raise DeserializationError("G1 point must be 48 bytes")
    flags = data[0]
    if not flags & _COMPRESSED_FLAG:
        raise DeserializationError("expected compressed encoding")
    if flags & _INFINITY_FLAG:
        if flags != (_COMPRESSED_FLAG | _INFINITY_FLAG) or any(data[1:]):
            raise DeserializationError("malformed infinity encoding")
        return None
    x = int.from_bytes(bytes([flags & 0x1F]) + data[1:], "big")
    if x >= P:
        raise DeserializationError("x coordinate not canonical")
    y2 = (x * x * x + G1_B) % P
    y = gf.fp_sqrt(y2)
    if y is None:
        raise DeserializationError("point not on curve")
    if _y_is_lexicographically_largest_fp(y) != bool(flags & _Y_LARGEST_FLAG):
        y = (-y) % P
    pt = (x, y)
    if subgroup_check and not g1_in_subgroup(pt):
        raise DeserializationError("point not in correct subgroup")
    return pt


def g2_compress(p) -> bytes:
    if p is None:
        return bytes([_COMPRESSED_FLAG | _INFINITY_FLAG] + [0] * 95)
    (x0, x1), y = p
    out = bytearray(x1.to_bytes(48, "big") + x0.to_bytes(48, "big"))
    out[0] |= _COMPRESSED_FLAG
    if _y_is_lexicographically_largest_fp2(y):
        out[0] |= _Y_LARGEST_FLAG
    return bytes(out)


def g2_decompress(data: bytes, subgroup_check: bool = True):
    if len(data) != 96:
        raise DeserializationError("G2 point must be 96 bytes")
    flags = data[0]
    if not flags & _COMPRESSED_FLAG:
        raise DeserializationError("expected compressed encoding")
    if flags & _INFINITY_FLAG:
        if flags != (_COMPRESSED_FLAG | _INFINITY_FLAG) or any(data[1:]):
            raise DeserializationError("malformed infinity encoding")
        return None
    x1 = int.from_bytes(bytes([flags & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:96], "big")
    if x0 >= P or x1 >= P:
        raise DeserializationError("x coordinate not canonical")
    x = (x0, x1)
    y2 = gf.fp2_add(gf.fp2_mul(gf.fp2_sqr(x), x), (4, 4))
    y = gf.fp2_sqrt(y2)
    if y is None:
        raise DeserializationError("point not on curve")
    if _y_is_lexicographically_largest_fp2(y) != bool(flags & _Y_LARGEST_FLAG):
        y = gf.fp2_neg(y)
    pt = (x, y)
    if subgroup_check and not g2_in_subgroup(pt):
        raise DeserializationError("point not in correct subgroup")
    return pt
