"""jnp/XLA implementation of RNS Montgomery arithmetic (see ops/rns.py).

Element layout: trailing axis holds 2k u32 residues [base A | base B],
canonical (< modulus).  All heavy steps are either elementwise u32 lane
work (residue muls + pseudo-Mersenne folds — no carries, no cross-limb
traffic) or exact bf16->f32 matmuls on the MXU (base extensions, RNS <->
positional conversions).  Bit-identical to the RNSSpec golden model.

Exactness of the matmuls: operands are split into 8-bit pieces, cast to
bf16 (integers < 256 are exact in bf16), products < 2^16 and k-term f32
accumulations < 2^24 — every sum is exactly representable.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rns import RNSSpec, fp_rns, fr_rns  # noqa: F401


class RNSOps:
    """Vectorized RNS ops for one field.  Residue axis is the LAST axis."""

    def __init__(self, spec: RNSSpec):
        self.spec = spec
        k = spec.k
        self.k = k
        self.n_res = 2 * k
        p = spec.p

        m_all = np.array(spec.A.m + spec.B.m, dtype=np.uint32)
        self.m_all = m_all
        self.eps_all = np.uint32((1 << 15)) - m_all
        self.qconst = np.array(spec.qconst, dtype=np.uint32)       # [kA]
        self.recip_A = np.array(spec.A.recip, dtype=np.uint32)
        self.recip_B = np.array(spec.B.recip, dtype=np.uint32)
        self.p_modB = np.array(spec.p_modB, dtype=np.uint32)
        self.MAinv_modB = np.array(spec.MAinv_modB, dtype=np.uint32)
        self.MA_modB = np.array(spec.MA_modB, dtype=np.uint32)
        self.MB_modA = np.array(spec.MB_modA, dtype=np.uint32)
        self.BMi_inv = np.array(spec.B.Mi_inv, dtype=np.uint32)

        # extension matrices, transposed for [lanes, k] @ [k, k']
        self.AB_lo, self.AB_hi = self._split(spec.ext_AB.T)  # [kA, kB]
        self.BA_lo, self.BA_hi = self._split(spec.ext_BA.T)  # [kB, kA]

        # positional (16-bit limbs) -> RNS: pow2 matrix [n_limbs, 2k]
        self.n_limbs = -(-p.bit_length() // 16)
        # to_value_limbs output width: values reach 3p (2 extra bits)
        self.n_limbs_out = max(self.n_limbs, -(-(p.bit_length() + 2) // 16))
        pow2 = np.array(
            [[pow(1 << 16, i, int(m)) for m in m_all.tolist()]
             for i in range(self.n_limbs)], dtype=np.int64)
        self.P2_lo, self.P2_hi = self._split(pow2)

        # magnitude-p multiples for sub(): d*p in RNS, built lazily
        self._p_mults = {}

        # RNS -> positional CRT: sigma [k] @ Mi16 [k, L16] - alpha*M_A,
        # where Mi16[i] = 16-bit limbs of M_A/a_i, L16 limbs of M_A
        self.L16 = -(-spec.A.M.bit_length() // 16)
        Mi16 = np.array(
            [[(spec.A.Mi[i] >> (16 * l)) & 0xFFFF for l in range(self.L16)]
             for i in range(k)], dtype=np.int64)
        self.Mi16_lo, self.Mi16_hi = self._split(Mi16)
        self.MA16_mult = np.stack(
            [np.array([(a * spec.A.M >> (16 * l)) & 0xFFFF
                       for l in range(self.L16)], dtype=np.uint32)
             for a in range(k + 1)])           # [k+1, L16]

    @staticmethod
    def _split(mat):
        mat = np.asarray(mat, dtype=np.int64)
        return (jnp.asarray((mat & 0xFF).astype(np.float32),
                            dtype=jnp.bfloat16),
                jnp.asarray((mat >> 8).astype(np.float32),
                            dtype=jnp.bfloat16))

    # ------------------------------------------------------------- folding
    def _fold(self, t, m, eps):
        """t (u32, < 2^30) -> canonical residue < m.  5 pseudo-Mersenne
        folds + 1 conditional subtract (see rns.py bound chain)."""
        for _ in range(5):
            t = (t >> 15) * eps + (t & 0x7FFF)
        return jnp.where(t >= m, t - m, t)

    def fold_all(self, t):
        return self._fold(t, self.m_all, self.eps_all)

    def _foldA(self, t):
        return self._fold(t, self.m_all[:self.k], self.eps_all[:self.k])

    def _foldB(self, t):
        return self._fold(t, self.m_all[self.k:], self.eps_all[self.k:])

    # ------------------------------------------------------- exact matmuls
    @staticmethod
    def _dot4(sig, mlo, mhi):
        """Exact integer [..., r] @ [r, c] via four bf16 matmuls.

        sig: u32 < 2^15.  Returns u32 [..., c] = sig @ mat exactly
        (bound < r * 2^30 < 2^35 — returned as (low, high) split? No:
        the true sum fits f32 exactly only per byte-product; recombine
        in u32 with interleaved folding by the caller via combine()."""
        lo = (sig & 0xFF).astype(jnp.bfloat16)
        hi = (sig >> 8).astype(jnp.bfloat16)
        f = jnp.float32
        s_ll = jnp.matmul(lo, mlo, preferred_element_type=f)
        s_lh = jnp.matmul(lo, mhi, preferred_element_type=f)
        s_hl = jnp.matmul(hi, mlo, preferred_element_type=f)
        s_hh = jnp.matmul(hi, mhi, preferred_element_type=f)
        return (s_ll.astype(jnp.uint32), s_lh.astype(jnp.uint32),
                s_hl.astype(jnp.uint32), s_hh.astype(jnp.uint32))

    def _combine_mod(self, parts, m, eps):
        """(ll, lh, hl, hh) byte-product sums -> Σ mod m (canonical).

        true value = ll + 2^8(lh + hl) + 2^16 hh; each part < k*2^16 <
        2^21.  Horner in base 2^8 with folds keeps everything < 2^30."""
        ll, lh, hl, hh = parts
        t = self._fold((hh << 8) + lh + hl, m, eps)     # < 2^30 -> < m
        return self._fold((t << 8) + ll, m, eps)        # < 2^23+2^21 -> < m

    # ------------------------------------------------------------- cox unit
    def _cox(self, sig, recip, beta_half: bool):
        """alpha estimate: floor((Σ (sig*recip >> 15)) / 2^16 [+ 1/2])."""
        ws = jnp.sum((sig * recip) >> 15, axis=-1, dtype=jnp.uint32)
        if beta_half:
            ws = ws + np.uint32(1 << 15)
        return ws >> 16                                  # [...]

    # ---------------------------------------------------------- public ops
    def mul(self, x, y):
        """RNS Montgomery product: value(x)*value(y)*M_A^{-1} mod p + {0..2}p.

        x, y: [..., 2k] canonical u32.  Bit-identical to RNSSpec.mul."""
        k = self.k
        w = self.fold_all(x * y)                         # [..., 2k]
        wA, wB = w[..., :k], w[..., k:]
        sig = self._foldA(wA * self.qconst)              # [..., kA]
        alpha = self._cox(sig, self.recip_A, beta_half=False)
        parts = self._dot4(sig, self.AB_lo, self.AB_hi)
        qB = self._combine_mod(parts, self.m_all[k:], self.eps_all[k:])
        # subtract alpha*M_A mod b_j (alpha <= kA): add pad multiple of b
        d = alpha[..., None] * self.MA_modB              # < 2^5 * 2^15
        pad = ((np.uint32(1) << 21) // self.m_all[k:] + 1) * self.m_all[k:]
        qB = self._foldB(qB + pad - d)
        t = self._foldB(qB * self.p_modB)
        t = jnp.where(wB + t >= self.m_all[k:], wB + t - self.m_all[k:],
                      wB + t)
        rB = self._foldB(t * self.MAinv_modB)
        # exact extension back to base A
        sig2 = self._foldB(rB * self.BMi_inv)
        alpha2 = self._cox(sig2, self.recip_B, beta_half=True)
        parts2 = self._dot4(sig2, self.BA_lo, self.BA_hi)
        rA = self._combine_mod(parts2, self.m_all[:k], self.eps_all[:k])
        d2 = alpha2[..., None] * self.MB_modA
        padA = ((np.uint32(1) << 21) // self.m_all[:k] + 1) * self.m_all[:k]
        rA = self._foldA(rA + padA - d2)
        return jnp.concatenate([rA, rB], axis=-1)

    def add(self, x, y):
        s = x + y
        return jnp.where(s >= self.m_all, s - self.m_all, s)

    def _p_mult(self, d: int):
        if d not in self._p_mults:
            self._p_mults[d] = np.array(self.spec.to_rns(d * self.spec.p),
                                        dtype=np.uint32)
        return self._p_mults[d]

    def sub(self, x, y, y_mag: int = 3):
        """x - y + y_mag*p (caller tracks value magnitudes; y_mag is a
        static python int, any size — the shift constant is cached)."""
        s = x + self._p_mult(y_mag) + self.m_all - y
        s = jnp.where(s >= self.m_all, s - self.m_all, s)
        return jnp.where(s >= self.m_all, s - self.m_all, s)

    # ------------------------------------------------------- conversions
    def from_limbs(self, limbs):
        """positional [..., n_limbs] 16-bit limbs (normal form, < p
        assumed for canonical use) -> RNS residues [..., 2k]."""
        parts = self._dot4(limbs.astype(jnp.uint32),
                           self.P2_lo, self.P2_hi)
        return self._combine_mod(parts, self.m_all, self.eps_all)

    def to_value_limbs(self, res):
        """RNS [..., 2k] (value < 3p) -> positional 16-bit limbs
        [..., n_limbs] of the EXACT value v < 3p (not reduced mod p).

        CRT via MXU: v = Σ sigma_i*(M_A/a_i) - alpha*M_A with the exact
        cox alpha (v < 3p << M_A/2 satisfies the beta=1/2 condition).
        The per-column byte-product sums resolve to 16-bit limbs with two
        sequential passes over the ~25 columns (boundary op — runs once
        per graph on a handful of lanes, latency negligible)."""
        k = self.k
        sig = self._foldA(res[..., :k] * np.array(
            self.spec.A.Mi_inv, dtype=np.uint32))
        alpha = self._cox(sig, self.recip_A, beta_half=True)
        ll, lh, hl, hh = self._dot4(sig, self.Mi16_lo, self.Mi16_hi)
        cols = ll + ((lh + hl) << 8)       # weight 2^16i, < 2^30 + 2^21
        amul = jnp.take(jnp.asarray(self.MA16_mult), alpha, axis=0)
        L = cols.shape[-1]
        # pass 1: carry-resolve columns (hh carries one column up)
        limbs = []
        carry = jnp.zeros(cols.shape[:-1], dtype=jnp.uint32)
        for i in range(L):
            t = cols[..., i] + carry
            limbs.append(t & 0xFFFF)
            carry = (t >> 16) + hh[..., i]          # hh: weight 2^16
        # pass 2: subtract alpha*M_A with borrow
        out = []
        borrow = jnp.zeros(cols.shape[:-1], dtype=jnp.uint32)
        for i in range(L):
            v = limbs[i] + (np.uint32(1) << 16) - amul[..., i] - borrow
            out.append(v & 0xFFFF)
            borrow = np.uint32(1) - (v >> 16)
        v16 = jnp.stack(out, axis=-1)
        return v16[..., :self.n_limbs_out]
