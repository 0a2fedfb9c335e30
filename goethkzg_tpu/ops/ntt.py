"""Number-theoretic transforms over Fr for TPU.

Replaces the reference's in-place Gentleman–Sande loop
(reference: internal/domain/fft.go:109-144) with a fully vectorized
stage-sliced formulation: each of the log2(N) stages is one batched
butterfly over the whole array (2 adds + 1 mul on [..., N/2] elements),
followed by a single bit-reversal gather.  Mathematically identical output:
fft(x)[k] = sum_i x[i] * g^(ik) in natural order.

Coset transforms scale by precomputed coset-generator powers
(reference: internal/domain/coset_fft.go:41-70).
"""

import functools

import jax.numpy as jnp
import numpy as np

from ..constants import MAX_ORDER_ROOT, R_MOD, ROOT_OF_UNITY_2E32
from .field import fr_spec


def root_of_unity(order: int) -> int:
    """Generator of the multiplicative subgroup of Fr of the given order.

    Matches reference domain construction (internal/domain/domain.go:61-79).
    """
    assert order & (order - 1) == 0 and order <= (1 << MAX_ORDER_ROOT)
    expo = (1 << MAX_ORDER_ROOT) // order
    return pow(ROOT_OF_UNITY_2E32, expo, R_MOD)


def bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse(x, axis=-2):
    """Bit-reversal permutation along the element axis of [..., N, limbs]."""
    n = x.shape[axis]
    return jnp.take(x, bitrev_indices(n), axis=axis)


class Domain:
    """Evaluation domain of size N with (optionally bit-reversed) root tables."""

    def __init__(self, n: int):
        fr = self.fr = fr_spec()
        self.n = n
        self.generator = root_of_unity(n)
        self.generator_inv = pow(self.generator, -1, R_MOD)
        self.n_inv = pow(n, -1, R_MOD)
        # host numpy tables throughout (device constants stall lowering —
        # see ops/field.py)
        self.n_inv_mont = fr.from_int(self.n_inv)

        # stage twiddles for forward/inverse transforms
        self._tw_fwd = self._stage_twiddles(self.generator)
        self._tw_inv = self._stage_twiddles(self.generator_inv)
        self._rev = bitrev_indices(n)

        # natural-order roots (host ints) and Montgomery limb tables
        self.roots_int = self._powers_int(self.generator)
        self.roots_natural = self._to_dev(self.roots_int)

    def _powers_int(self, g: int):
        out = [1]
        for _ in range(self.n - 1):
            out.append(out[-1] * g % R_MOD)
        return out

    def _to_dev(self, ints):
        fr = self.fr
        return np.stack([fr.from_int(v) for v in ints])

    def _stage_twiddles(self, g: int):
        """For stage with block size s: w_k = g^{(n/s) k}, k < s/2."""
        fr = self.fr
        tws = []
        s = self.n
        while s >= 2:
            step = pow(g, self.n // s, R_MOD)
            w = 1
            ws = []
            for _ in range(s // 2):
                ws.append(fr.from_int(w))
                w = w * step % R_MOD
            tws.append(np.stack(ws))
            s //= 2
        return tws

    def _core(self, x, tws):
        """Gentleman–Sande DIF over [..., N, limbs], then brp to natural order."""
        fr = self.fr
        n = self.n
        lead = x.shape[:-2]
        s = n
        for tw in tws:
            half = s // 2
            x = x.reshape(lead + (n // s, s, fr.n))
            a = x[..., :half, :]
            b = x[..., half:, :]
            u = fr.add(a, b)
            v = fr.mul(fr.sub(a, b), tw)
            x = jnp.concatenate([u, v], axis=-2).reshape(lead + (n, fr.n))
            s = half
        return jnp.take(x, self._rev, axis=-2)

    def fft(self, x):
        return self._core(x, self._tw_fwd)

    def ifft(self, x):
        out = self._core(x, self._tw_inv)
        return self.fr.mul(out, self.n_inv_mont)


class CosetDomain:
    """FFT over a multiplicative coset g_c * <g>. Matches coset_fft.go."""

    def __init__(self, domain: Domain, coset_gen: int):
        fr = fr_spec()
        self.domain = domain
        self.coset_gen = coset_gen
        inv = pow(coset_gen, -1, R_MOD)
        n = domain.n
        pw, pwi = [1], [1]
        for _ in range(n - 1):
            pw.append(pw[-1] * coset_gen % R_MOD)
            pwi.append(pwi[-1] * inv % R_MOD)
        self._scale = np.stack([fr.from_int(v) for v in pw])
        self._scale_inv = np.stack([fr.from_int(v) for v in pwi])

    def coset_fft(self, x):
        fr = self.domain.fr
        return self.domain.fft(fr.mul(x, self._scale))

    def coset_ifft(self, x):
        fr = self.domain.fr
        return fr.mul(self.domain.ifft(x), self._scale_inv)


@functools.cache
def get_domain(n: int) -> Domain:
    return Domain(n)
