"""TPU-native elliptic-curve group ops, generic over the coordinate field.

Points are tuples of coordinate arrays (X, Y, Z) in Jacobian form; infinity
is encoded as Z == 0 (any X, Y).  All formulas are branchless: exceptional
cases (doubling, inverses, infinities) are computed alongside and selected
with masks, so the same compiled kernel handles every input — the TPU-native
replacement for gnark's branching Jacobian code (SURVEY.md §2.4).

The field argument is either `field.FieldSpec` (G1 over Fp) or
`field2.Fp2Field` (G2 over Fp2); both expose add/sub/mul/sqr/neg/is_zero/
eq/select and a `zero`/`one_mont` constant of their element shape.
"""

import jax.numpy as jnp
import numpy as np


class CurveOps:
    def __init__(self, F):
        self.F = F

    # -- pallas dispatch --------------------------------------------------------
    def _pallas_lanes(self, batch_shapes):
        """Lane count if the pallas point kernels apply, else 0.

        Only for G1 over the base FieldSpec (Fp2/G2 stays on the jnp path),
        only on TPU backends, and only when wide enough to amortize the
        kernel dispatch (see ops/pallas_curve.py).
        """
        from .field import FieldSpec, _pallas_enabled, _PALLAS_MIN_LANES
        if not isinstance(self.F, FieldSpec) or not _pallas_enabled():
            return 0
        shape = jnp.broadcast_shapes(*batch_shapes)
        lanes = 1
        for d in shape:
            lanes *= d
        return lanes if lanes >= _PALLAS_MIN_LANES else 0

    def _bcast(self, coords, batch):
        n = self.F.n
        return tuple(jnp.broadcast_to(c, batch + (n,)) for c in coords)

    # -- constructors ---------------------------------------------------------
    def infinity(self, batch_shape=()):
        F = self.F
        z = jnp.broadcast_to(F.zero_elem, batch_shape + F.zero_elem.shape)
        return (z, z, z)

    def from_affine(self, x, y, inf_mask=None):
        """(x, y) affine Montgomery coords -> Jacobian. inf_mask marks infinities."""
        F = self.F
        one = jnp.broadcast_to(F.one_elem, x.shape)
        z = one
        if inf_mask is not None:
            z = F.select(inf_mask, jnp.zeros_like(one), one)
        return (x, y, z)

    def is_infinity(self, p):
        return self.F.is_zero(p[2])

    # -- group law -------------------------------------------------------------
    def double(self, p):
        """dbl-2009-l; maps infinity to infinity automatically (Z3 = 2YZ)."""
        F = self.F
        if self._pallas_lanes([c.shape[:-1] for c in p]):
            from . import pallas_curve
            batch = jnp.broadcast_shapes(*[c.shape[:-1] for c in p])
            return pallas_curve.double(F, self._bcast(p, batch))
        X, Y, Z = p
        A = F.sqr(X)
        B = F.sqr(Y)
        C = F.sqr(B)
        t = F.sqr(F.add(X, B))
        D = F.sub(F.sub(t, A), C)
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        G = F.sqr(E)
        X3 = F.sub(G, F.add(D, D))
        C2 = F.add(C, C)
        C8 = F.add(F.add(C2, C2), F.add(C2, C2))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
        Z3 = F.mul(F.add(Y, Y), Z)
        return (X3, Y3, Z3)

    def add(self, p1, p2):
        """Complete Jacobian + Jacobian addition."""
        F = self.F
        shapes = [c.shape[:-1] for c in (*p1, *p2)]
        if self._pallas_lanes(shapes):
            from . import pallas_curve
            batch = jnp.broadcast_shapes(*shapes)
            return pallas_curve.add(F, self._bcast(p1, batch),
                                    self._bcast(p2, batch))
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        inf1 = F.is_zero(Z1)
        inf2 = F.is_zero(Z2)
        Z1Z1 = F.sqr(Z1)
        Z2Z2 = F.sqr(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, U1)
        rr = F.sub(S2, S1)
        rr = F.add(rr, rr)
        x_eq = F.is_zero(H)
        y_eq = F.is_zero(rr)
        H2 = F.add(H, H)
        I = F.sqr(H2)
        J = F.mul(H, I)
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.sqr(rr), J), F.add(V, V))
        SJ = F.mul(S1, J)
        Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.add(SJ, SJ))
        Z3 = F.mul(F.mul(Z1, Z2), H2)

        is_double = x_eq & y_eq & ~inf1 & ~inf2
        dX, dY, dZ = self.double(p1)
        X3 = F.select(is_double, dX, X3)
        Y3 = F.select(is_double, dY, Y3)
        Z3 = F.select(is_double, dZ, Z3)
        # P1 = -P2 (x_eq, not y_eq): H == 0 makes Z3 == 0 already => infinity.
        # infinities:
        X3 = F.select(inf1, X2, F.select(inf2 & ~inf1, X1, X3))
        Y3 = F.select(inf1, Y2, F.select(inf2 & ~inf1, Y1, Y3))
        Z3 = F.select(inf1, Z2, F.select(inf2 & ~inf1, Z1, Z3))
        return (X3, Y3, Z3)

    def add_affine(self, p1, a2, a2_inf=None):
        """Complete mixed addition: Jacobian p1 + affine a2=(x2, y2).

        a2_inf: optional bool mask marking infinity entries of a2.
        """
        F = self.F
        shapes = [c.shape[:-1] for c in (*p1, *a2)]
        if self._pallas_lanes(shapes):
            from . import pallas_curve
            from .field import limbs_to_int
            batch = jnp.broadcast_shapes(*shapes)
            inf = (jnp.broadcast_to(a2_inf, batch) if a2_inf is not None
                   else jnp.zeros(batch, dtype=jnp.uint32))
            return pallas_curve.add_affine(F, self._bcast(p1, batch),
                                           self._bcast(a2, batch), inf,
                                           F.R_mod)
        X1, Y1, Z1 = p1
        x2, y2 = a2
        inf1 = F.is_zero(Z1)
        Z1Z1 = F.sqr(Z1)
        U2 = F.mul(x2, Z1Z1)
        S2 = F.mul(F.mul(y2, Z1), Z1Z1)
        H = F.sub(U2, X1)
        rr = F.sub(S2, Y1)
        rr = F.add(rr, rr)
        x_eq = F.is_zero(H)
        y_eq = F.is_zero(rr)
        H2 = F.add(H, H)
        I = F.sqr(H2)
        J = F.mul(H, I)
        V = F.mul(X1, I)
        X3 = F.sub(F.sub(F.sqr(rr), J), F.add(V, V))
        SJ = F.mul(Y1, J)
        Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.add(SJ, SJ))
        Z3 = F.mul(Z1, H2)

        is_double = x_eq & y_eq & ~inf1
        dX, dY, dZ = self.double(p1)
        X3 = F.select(is_double, dX, X3)
        Y3 = F.select(is_double, dY, Y3)
        Z3 = F.select(is_double, dZ, Z3)
        # p1 at infinity -> a2 promoted to Jacobian
        one = jnp.broadcast_to(F.one_elem, Z3.shape)
        X3 = F.select(inf1, x2, X3)
        Y3 = F.select(inf1, y2, Y3)
        Z3 = F.select(inf1, one, Z3)
        if a2_inf is not None:
            X3 = F.select(a2_inf, X1, X3)
            Y3 = F.select(a2_inf, Y1, Y3)
            Z3 = F.select(a2_inf, Z1, Z3)
        return (X3, Y3, Z3)

    def neg(self, p):
        X, Y, Z = p
        return (X, self.F.neg(Y), Z)

    def select(self, cond, p1, p2):
        F = self.F
        return tuple(F.select(cond, a, b) for a, b in zip(p1, p2))

    # -- scalar multiplication ---------------------------------------------------
    def scalar_mul_bits(self, p, bits):
        """[k]P via double-and-add over `bits` (jnp array, MSB first).

        p is a Jacobian point (batched); bits has shape [n_bits] or
        batch_shape + [n_bits] (per-element scalars).
        """
        import jax

        per_element = bits.ndim > 1

        def body(acc, bit):
            acc2 = self.double(acc)
            acc3 = self.add(acc2, p)
            mask = bit == 1
            return self.select(mask, acc3, acc2), None

        batch_shape = p[2].shape[:-self.F.trailing_dims]
        # infinity init built from p's coords so it inherits p's varying-axes
        # type (shard_map scan-carry requirement); broadcast to batch shape
        zlike = jnp.broadcast_to((p[2] ^ p[2]),
                                 batch_shape + self.F.zero_elem.shape)
        init = (zlike, zlike, zlike)
        scan_bits = jnp.moveaxis(bits, -1, 0) if per_element else bits
        out, _ = jax.lax.scan(body, init, scan_bits)
        return out

    def scalar_mul_fr(self, p, scalar_limbs_normal):
        """[k]P where k is Fr limbs in normal (non-Montgomery) form."""
        # bits, MSB first: limb j bit b -> position 16*j + b
        limbs = scalar_limbs_normal
        shifts = np.arange(16, dtype=np.uint32)
        bits = (limbs[..., :, None] >> shifts[None, :]) & 1  # [..., 16, 16] LSB order
        bits = bits.reshape(bits.shape[:-2] + (-1,))[..., ::-1]  # MSB first
        return self.scalar_mul_bits(p, bits.astype(jnp.uint32))

    # -- conversion ---------------------------------------------------------------
    def to_affine(self, p):
        """Batch-normalize Jacobian points to affine + infinity mask."""
        F = self.F
        X, Y, Z = p
        inf = F.is_zero(Z)
        zsafe = F.select(inf, jnp.broadcast_to(F.one_elem, Z.shape), Z)
        zinv = F.inv(zsafe)
        zinv2 = F.sqr(zinv)
        zinv3 = F.mul(zinv2, zinv)
        return F.mul(X, zinv2), F.mul(Y, zinv3), inf
