"""RNS fixed-base table MSM — the MXU commit path.

Replaces the positional Pallas table-MSM kernel (ops/pallas_tablemsm.py)
with pure-XLA RNS arithmetic: every Montgomery multiply becomes ~50
elementwise u32 lane-ops + four exact bf16 MXU matmuls per base
extension (ops/rns_jax.py), instead of ~13.5k VPU lane-ops.  The group
law is the same complete RCB projective mixed add (11 muls) as
ops/proj.py, with RNS lazy-add magnitude discipline:

    mul outputs are < 3p for inputs < 256p (RNSSpec c_pow=8);
    the worst intermediate in the add chain is 12*(6p+6p) = 144p < 256p;
    accumulator coordinates stay < 6p across iterations (see bounds in
    rns_mixed_add).

Table layout: [PT, D, L, 2k] u32 residues per coordinate (w4: ~0.94 GB
for both, streamed once per batch through the scan).

reference: internal/kzg/srs.go:56 (Commit = MSM against the fixed
Lagrange key) — the fixed base is what lets the table precompute;
gnark's generic Pippenger cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .rns_jax import RNSOps


class RNSCurve:
    """Complete RCB projective group law over an RNSOps field."""

    def __init__(self, ops: RNSOps):
        self.ops = ops
        spec = ops.spec
        # Montgomery-domain constants as RNS residues
        self.one = np.array(spec.to_rns(spec.R % spec.p), dtype=np.uint32)
        self.zero = np.zeros(ops.n_res, dtype=np.uint32)

    def infinity(self, batch_shape=()):
        shape = tuple(batch_shape) + (self.ops.n_res,)
        return (jnp.zeros(shape, jnp.uint32),
                jnp.broadcast_to(self.one, shape),
                jnp.zeros(shape, jnp.uint32))

    def _mul12(self, v):
        # v < 6p -> 12v < 72p; residue adds stay canonical
        o = self.ops
        v2 = o.add(v, v)
        v4 = o.add(v2, v2)
        v8 = o.add(v4, v4)
        return o.add(v8, v4)

    def mixed_add(self, P1, a2):
        """(X1:Y1:Z1) + affine (x2, y2); RCB15 alg. 8 (a=0, b3=12).

        Magnitude bounds (c = 256): inputs X1,Y1,Z1 < 6p, x2,y2 < 3p;
        every mul input <= 144p < 256p; outputs < 6p.  x2,y2 must be a
        real point — mask infinity lanes outside."""
        o = self.ops
        X1, Y1, Z1 = P1
        x2, y2 = a2
        t0 = o.mul(X1, x2)                        # < 3p
        t1 = o.mul(Y1, y2)                        # < 3p
        t3 = o.mul(o.add(X1, Y1), o.add(x2, y2))  # < 3p (in: 12p, 6p)
        t3 = o.sub(t3, o.add(t0, t1), 6)          # < 9p
        t4 = o.add(o.mul(y2, Z1), Y1)             # < 9p
        Y3 = o.add(o.mul(x2, Z1), X1)             # < 9p
        X3 = o.add(t0, t0)                        # < 6p
        t0 = o.add(X3, t0)                        # < 9p
        t2 = self._mul12(Z1)                      # < 72p
        Z3 = o.add(t1, t2)                        # < 75p
        t1 = o.sub(t1, t2, 72)                    # < 75p
        Y3 = self._mul12(Y3)                      # < 108p
        X3 = o.mul(t4, Y3)                        # < 3p (in: 9p, 108p)
        X3 = o.sub(o.mul(t3, t1), X3, 3)          # < 6p (in: 9p, 75p)
        Y3 = o.mul(Y3, t0)                        # < 3p (in: 108p, 9p)
        Y3 = o.add(o.mul(t1, Z3), Y3)             # < 6p (in: 75p, 75p)
        t0 = o.mul(t0, t3)                        # < 3p
        Z3 = o.add(o.mul(Z3, t4), t0)             # < 6p (in: 75p, 9p)
        return X3, Y3, Z3

    def add(self, P1, P2):
        """Complete projective add (RCB15 alg. 7, a=0, b3=12).

        Inputs < 6p, outputs < 6p; worst mul input 144p < 256p."""
        o = self.ops
        X1, Y1, Z1 = P1
        X2, Y2, Z2 = P2
        t0 = o.mul(X1, X2)
        t1 = o.mul(Y1, Y2)
        t2 = o.mul(Z1, Z2)
        t3 = o.mul(o.add(X1, Y1), o.add(X2, Y2))      # in < 12p
        t3 = o.sub(t3, o.add(t0, t1), 6)              # < 9p
        t4 = o.mul(o.add(Y1, Z1), o.add(Y2, Z2))
        t4 = o.sub(t4, o.add(t1, t2), 6)              # < 9p
        X3 = o.mul(o.add(X1, Z1), o.add(X2, Z2))
        Y3 = o.sub(X3, o.add(t0, t2), 6)              # < 9p
        X3 = o.add(t0, t0)
        t0 = o.add(X3, t0)                            # < 9p
        t2 = self._mul12(t2)                          # < 36p
        Z3 = o.add(t1, t2)                            # < 39p
        t1 = o.sub(t1, t2, 36)                        # < 39p
        Y3 = self._mul12(Y3)                          # < 108p
        X3 = o.mul(t4, Y3)                            # < 3p
        X3 = o.sub(o.mul(t3, t1), X3, 3)              # < 6p
        Y3 = o.mul(Y3, t0)                            # < 3p
        Y3 = o.add(o.mul(t1, Z3), Y3)                 # < 6p
        t0 = o.mul(t0, t3)                            # < 3p
        Z3 = o.add(o.mul(Z3, t4), t0)                 # < 6p
        return X3, Y3, Z3

    def select(self, mask, P1, P2):
        """mask broadcastable over batch dims: P1 where mask else P2."""
        return tuple(jnp.where(mask[..., None], a, b)
                     for a, b in zip(P1, P2))

    def neg_y(self, y):
        """-y (magnitude 3 -> < 3p)."""
        o = self.ops
        return o.sub(jnp.zeros_like(y), y, 3)

    def tree_add(self, pts, axis_from_end=0):
        """Log-depth pairwise reduction along one batch axis (axis counted
        from the right, excluding the residue axis)."""
        def ax(c):
            return c.ndim - 1 - 1 - axis_from_end

        while pts[0].shape[ax(pts[0])] > 1:
            m = pts[0].shape[ax(pts[0])]
            if m % 2 == 1:
                inf = self.infinity()

                def pad(c, fill):
                    a = ax(c)
                    pad_shape = c.shape[:a] + (1,) + c.shape[a + 1:]
                    return jnp.concatenate(
                        [c, jnp.broadcast_to(fill, pad_shape)], axis=a)

                pts = tuple(pad(c, f) for c, f in zip(pts, inf))

            def half(c, start):
                sl = [slice(None)] * c.ndim
                sl[ax(c)] = slice(start, None, 2)
                return c[tuple(sl)]

            lo = tuple(half(c, 0) for c in pts)
            hi = tuple(half(c, 1) for c in pts)
            pts = self.add(lo, hi)
        sq = []
        for c in pts:
            sl = [slice(None)] * c.ndim
            sl[ax(c)] = 0
            sq.append(c[tuple(sl)])
        return tuple(sq)


def convert_table_to_rns(ops: RNSOps, tx, ty, block_pt: int = 64):
    """Positional Montgomery table [PT, D, n, L] (R16 = 2^(16n)) ->
    RNS-Montgomery residues [PT, D, L, 2k] (values < 3p).

    K = M_A^2 * R16^{-1} mod p: mul(from_limbs(x*R16), K) =
    x*R16*K*M_A^{-1} = x*M_A mod p.  Chunked over PT to bound the
    conversion graph's live memory."""
    spec = ops.spec
    n = tx.shape[2]
    K = np.array(spec.to_rns(
        spec.A.M * spec.A.M % spec.p
        * pow(pow(2, 16 * n, spec.p), -1, spec.p) % spec.p),
        dtype=np.uint32)

    @jax.jit
    def conv(t):
        limbs = jnp.moveaxis(t, 2, 3)           # [pt, D, L, n]
        return ops.mul(ops.from_limbs(limbs), K)

    outs_x, outs_y = [], []
    PT = tx.shape[0]
    for s in range(0, PT, block_pt):
        outs_x.append(conv(tx[s:s + block_pt]))
        outs_y.append(conv(ty[s:s + block_pt]))
    return jnp.concatenate(outs_x), jnp.concatenate(outs_y)


def rns_table_msm(ops: RNSOps, table_rns, packed_digits, steps_per_iter=1):
    """Batched fixed-base MSM over the RNS table.

    table_rns: (tx, ty) [PT, D, L, 2k]; packed_digits [B, PT, L] u32
    (idx | sign<<8 | zero<<9, from pallas_tablemsm.pack_digits_lanes).
    Returns projective RNS accumulators (X, Y, Z) each [B, L, 2k]."""
    curve = RNSCurve(ops)
    tx, ty = table_rns
    PT, D, L, nr = tx.shape
    B = packed_digits.shape[0]

    acc = curve.infinity((B, L))
    iota = np.arange(D, dtype=np.uint32)

    def body(acc, inp):
        txs, tys, dig = inp                   # [D, L, 2k], [B, L]
        idx = dig & 0xFF
        sign = (dig >> 8) & 1
        zero = (dig >> 9) & 1
        onehot = (idx[..., None, :, None] ==
                  iota[:, None, None])        # [B, D, L, 1]
        sx = jnp.sum(jnp.where(onehot, txs[None], 0).astype(jnp.int32),
                     axis=1).astype(jnp.uint32)          # [B, L, 2k]
        sy = jnp.sum(jnp.where(onehot, tys[None], 0).astype(jnp.int32),
                     axis=1).astype(jnp.uint32)
        sy = jnp.where((sign == 1)[..., None], curve.neg_y(sy), sy)
        new = curve.mixed_add(acc, (sx, sy))
        acc = curve.select(zero == 1, acc, new)
        return acc, None

    xs = (tx, ty, jnp.moveaxis(packed_digits, 1, 0))
    acc, _ = jax.lax.scan(body, acc, xs)
    return acc


def rns_msm_to_limbs(ops: RNSOps, acc):
    """Tree-add the per-lane partials and return positional 16-bit limb
    Jacobian-style projective coords (values < 3p, EXACT — caller
    normalizes mod p on host or feeds curve code)."""
    curve = RNSCurve(ops)
    X, Y, Z = curve.tree_add(acc, axis_from_end=0)     # [B, 2k]
    return (ops.to_value_limbs(X), ops.to_value_limbs(Y),
            ops.to_value_limbs(Z))
