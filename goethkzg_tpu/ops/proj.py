"""Complete homogeneous-projective G1 group law (Renes-Costello-Batina).

The exception-free formulas for short-Weierstrass curves with a = 0
(RCB15, algorithms 7/8 specialised to j-invariant 0) — the group law used
by the round-2 Pallas MSM kernels and their XLA reduction tails:

* ONE code path for add/double/infinity: no is_double/is_infinity branch
  pair like the Jacobian law in ops/curve.py, so a complete mixed add
  costs 11 Montgomery muls (+2 small-constant muls done as add chains)
  instead of the Jacobian kernel's ~19;
* the point at infinity is the projective triple (0 : 1 : 0) — no
  separate mask array, and accumulators initialise to it for free.

Completeness holds for any points of the prime-order subgroup, including
P + P, P + (-P), and either operand at infinity; the *mixed* add requires
the affine operand to be a genuine (non-infinity) point — table entries
d * 2^(8w) * P_i with 1 <= d <= 128 and P_i of order r never are.

The reference delegates all group ops to gnark's Jacobian code
(reference: internal/multiexp/multiexp.go:20-34); this formulation is
chosen for the TPU, where the branch-free single path keeps every lane on
the same instruction stream.
"""

import jax.numpy as jnp


def infinity(spec, batch_shape=()):
    """(0 : 1 : 0) broadcast over batch_shape; coords are [..., n] limbs."""
    shape = tuple(batch_shape) + (spec.n,)
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    one = jnp.broadcast_to(spec.one_mont, shape)
    return zero, one, zero


def _mul_by_12(spec, v):
    """b3 = 3*b = 12 for BLS12-381 (b = 4), as an add chain (4 mod-adds)."""
    v2 = spec.add(v, v)
    v4 = spec.add(v2, v2)
    v8 = spec.add(v4, v4)
    return spec.add(v8, v4)


def add(spec, p1, p2):
    """Complete projective add (RCB15 alg. 7, a = 0, b3 = 12): 12M + 2*b3."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    mul, add_, sub = spec.mul, spec.add, spec.sub
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add_(X1, Y1), add_(X2, Y2))
    t3 = sub(t3, add_(t0, t1))
    t4 = mul(add_(Y1, Z1), add_(Y2, Z2))
    t4 = sub(t4, add_(t1, t2))
    Y3 = mul(add_(X1, Z1), add_(X2, Z2))
    Y3 = sub(Y3, add_(t0, t2))
    X3 = add_(t0, t0)
    t0 = add_(X3, t0)
    t2 = _mul_by_12(spec, t2)
    Z3 = add_(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _mul_by_12(spec, Y3)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = mul(Y3, t0)
    Y3 = add_(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add_(mul(Z3, t4), t0)
    return X3, Y3, Z3


def add_mixed(spec, p1, a2):
    """Complete mixed add (RCB15 alg. 8, a = 0): p1 projective + a2 affine.

    11M + 2*b3 add chains.  a2 = (x, y) must NOT be the point at infinity
    (callers mask infinity/zero-digit lanes by keeping the old accumulator).
    """
    X1, Y1, Z1 = p1
    x2, y2 = a2
    mul, add_, sub = spec.mul, spec.add, spec.sub
    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = mul(add_(X1, Y1), add_(x2, y2))
    t3 = sub(t3, add_(t0, t1))
    t4 = add_(mul(y2, Z1), Y1)
    Y3 = add_(mul(x2, Z1), X1)
    X3 = add_(t0, t0)
    t0 = add_(X3, t0)
    t2 = _mul_by_12(spec, Z1)
    Z3 = add_(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _mul_by_12(spec, Y3)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = mul(Y3, t0)
    Y3 = add_(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add_(mul(Z3, t4), t0)
    return X3, Y3, Z3


def to_jacobian(spec, p):
    """(X : Y : Z) -> Jacobian (X*Z, Y*Z^2, Z): 2M, infinity maps to Z=0."""
    X, Y, Z = p
    Z2 = spec.mul(Z, Z)
    return spec.mul(X, Z), spec.mul(Y, Z2), Z


def from_jacobian(spec, p):
    """Jacobian (X, Y, Z) -> (X*Z, Y, Z^3): X/Z^2 = XZ/Z^3, Y/Z^3."""
    X, Y, Z = p
    Z3 = spec.mul(spec.mul(Z, Z), Z)
    return spec.mul(X, Z), Y, Z3


def tree_add(spec, pts, axis_from_end: int = 0):
    """Log-depth pairwise projective reduction along one batch axis.

    pts: (X, Y, Z) with coord shape [..., n]; axis counted from the right
    excluding the limb axis (0 = last batch axis).  Odd sizes pad with
    (0:1:0) — which add() absorbs exactly.
    """
    def ax(c):
        return c.ndim - 1 - 1 - axis_from_end

    while pts[0].shape[ax(pts[0])] > 1:
        if pts[0].shape[ax(pts[0])] % 2 == 1:
            X, Y, Z = pts
            a = ax(X)
            pad_shape = X.shape[:a] + (1,) + X.shape[a + 1:]
            zero = jnp.zeros(pad_shape, dtype=X.dtype)
            one = jnp.broadcast_to(spec.one_mont, pad_shape)
            pts = (jnp.concatenate([X, zero], axis=a),
                   jnp.concatenate([Y, one], axis=a),
                   jnp.concatenate([Z, zero], axis=a))

        def half(c, start):
            sl = [slice(None)] * c.ndim
            sl[ax(c)] = slice(start, None, 2)
            return c[tuple(sl)]

        lo = tuple(half(c, 0) for c in pts)
        hi = tuple(half(c, 1) for c in pts)
        pts = add(spec, lo, hi)
    sq = []
    for c in pts:
        sl = [slice(None)] * c.ndim
        sl[ax(c)] = 0
        sq.append(c[tuple(sl)])
    return tuple(sq)
