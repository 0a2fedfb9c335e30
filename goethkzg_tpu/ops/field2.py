"""Fp2 = Fp[u]/(u^2+1) arithmetic over the limb engine, for G2 on TPU.

Elements are uint32 arrays of shape [..., 2, n] (c0, c1 stacked on axis -2).
"""

import functools

import jax.numpy as jnp
import numpy as np

from .field import fp_spec


class Fp2Field:
    def __init__(self):
        self.fp = fp_spec()
        n = self.fp.n
        # host numpy constants (see field.py: device constants stall lowering)
        self.zero_elem = np.zeros((2, n), dtype=np.uint32)
        self.one_elem = np.stack(
            [self.fp.one_mont, np.zeros((n,), dtype=np.uint32)])
        self.trailing_dims = 2

    def _c(self, a, i):
        return a[..., i, :]

    def _pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        return self.fp.add(a, b)

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def neg(self, a):
        return self.fp.neg(a)

    def mul(self, a, b):
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        b0, b1 = self._c(b, 0), self._c(b, 1)
        t0 = fp.mul(a0, b0)
        t1 = fp.mul(a1, b1)
        t2 = fp.mul(fp.add(a0, a1), fp.add(b0, b1))
        return self._pack(fp.sub(t0, t1), fp.sub(t2, fp.add(t0, t1)))

    def sqr(self, a):
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        c0 = fp.mul(fp.add(a0, a1), fp.sub(a0, a1))
        t = fp.mul(a0, a1)
        return self._pack(c0, fp.add(t, t))

    def mul_scalar_fp(self, a, s):
        """Multiply both components by an Fp element s [..., n]."""
        return self.fp.mul(a, s[..., None, :])

    def conj(self, a):
        return self._pack(self._c(a, 0), self.fp.neg(self._c(a, 1)))

    def mul_by_nonresidue(self, a):
        """(1+u) * a."""
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        return self._pack(fp.sub(a0, a1), fp.add(a0, a1))

    def inv(self, a):
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        norm = fp.add(fp.sqr(a0), fp.sqr(a1))
        ninv = fp.inv(norm)
        return self._pack(fp.mul(a0, ninv), fp.neg(fp.mul(a1, ninv)))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    # host-side helpers
    def from_ints(self, c: tuple, mont: bool = True) -> np.ndarray:
        return np.stack([self.fp.from_int(c[0], mont), self.fp.from_int(c[1], mont)])

    def to_ints(self, limbs, mont: bool = True) -> tuple:
        arr = np.asarray(limbs)
        return (self.fp.to_int(arr[..., 0, :], mont), self.fp.to_int(arr[..., 1, :], mont))


@functools.cache
def fp2_field() -> Fp2Field:
    return Fp2Field()
