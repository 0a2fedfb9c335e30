"""Group-valued FFT over G1 for the FK20 pipeline.

The reference uses a recursive Cooley–Tukey with per-butterfly big-int
scalar multiplications (reference: internal/domain/fft.go:19-92).  The
TPU-native design is an iterative DIT with all butterflies of a stage
vectorized: twiddles are *fixed* scalars, so their bits are baked in as
device constants and each stage's scalar multiplications run as one
double-and-add `lax.scan` across every butterfly lane simultaneously.

Output convention matches the reference: natural order in, natural order
out (brp of the input happens inside, as in iterative DIT).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_MOD
from .field import fr_spec
from .ntt import bitrev_indices, root_of_unity


def _scalar_bits_msb(k: int, nbits: int = 256) -> np.ndarray:
    return np.array([(k >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.uint32)


class G1FFT:
    """FFT/IFFT on [..., n] points (tuples of Jacobian coord arrays)."""

    def __init__(self, curve, n: int):
        self.curve = curve
        self.n = n
        g = root_of_unity(n)
        g_inv = pow(g, -1, R_MOD)
        self.n_inv_bits = _scalar_bits_msb(pow(n, -1, R_MOD))
        self._rev = bitrev_indices(n)
        self._tw_fwd = self._stage_bits(g)
        self._tw_inv = self._stage_bits(g_inv)

    def _stage_bits(self, g: int):
        """DIT stages s = 2, 4, ..., n; twiddles w = g^{(n/s) k}, k < s/2.

        Returns per-stage bit arrays [256, s/2] (scan-major axis first).
        """
        out = []
        s = 2
        while s <= self.n:
            step = pow(g, self.n // s, R_MOD)
            w = 1
            bits = []
            for _ in range(s // 2):
                bits.append(_scalar_bits_msb(w))
                w = w * step % R_MOD
            out.append(np.stack(bits, axis=1))  # [256, s/2]
            s *= 2
        return out

    def _scalar_mul_lanes(self, pts, bits):
        """[w_lane] * P_lane with per-lane fixed-scalar bits [256, lanes].

        pts: tuple of [..., lanes, *e] arrays.
        """
        curve = self.curve

        def body(acc, bit):
            acc2 = curve.double(acc)
            acc3 = curve.add(acc2, pts)
            return curve.select((bit == 1), acc3, acc2), None

        lanes = bits.shape[1]
        batch = pts[2].shape[:-curve.F.trailing_dims]
        init = curve.infinity(batch)
        # bits broadcast over leading batch dims: bit is [lanes], batch ends
        # with the lane axis, so mask aligns on the last batch dim.
        out, _ = jax.lax.scan(body, init, bits)
        return out

    def _core(self, pts, stages):
        curve = self.curve
        n = self.n
        pts = tuple(jnp.take(c, self._rev, axis=-1 - curve.F.trailing_dims)
                    for c in pts)
        s = 2
        for bits in stages:
            half = s // 2
            td = curve.F.trailing_dims
            lead = pts[0].shape[:-(td + 1)]
            eshape = pts[0].shape[-td:]
            view = tuple(c.reshape(lead + (n // s, s) + eshape) for c in pts)
            a = tuple(c[..., :half, *([slice(None)] * td)] for c in view)
            b = tuple(c[..., half:, *([slice(None)] * td)] for c in view)
            wb = self._scalar_mul_lanes(b, bits)
            lo = curve.add(a, wb)
            hi = curve.add(a, curve.neg(wb))
            pts = tuple(
                jnp.concatenate([l, h], axis=-(td + 1)).reshape(
                    lead + (n,) + eshape)
                for l, h in zip(lo, hi))
            s *= 2
        return pts

    def fft(self, pts):
        return self._core(pts, self._tw_fwd)

    def ifft(self, pts):
        out = self._core(pts, self._tw_inv)
        # scale by 1/n (fixed scalar) with a single double-and-add scan
        curve = self.curve

        def body(acc, bit):
            acc2 = curve.double(acc)
            acc3 = curve.add(acc2, out)
            return curve.select(bit == 1, acc3, acc2), None

        init = curve.infinity(out[2].shape[:-curve.F.trailing_dims])
        res, _ = jax.lax.scan(body, init, self.n_inv_bits)
        return res


@functools.cache
def get_g1_fft(n: int):
    from .curve import CurveOps
    from .field import fp_spec
    return G1FFT(CurveOps(fp_spec()), n)
