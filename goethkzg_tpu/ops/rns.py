"""RNS (residue number system) Montgomery arithmetic — the MXU field core.

Why.  The positional 16-bit-limb Montgomery multiply (ops/field.py /
ops/pallas_field.py) costs ~13.5k VPU lane-ops and measures 139 Mmul/s on
one v5e chip — every hot path (commit table-MSM, batched evals, FK20) is
bound by exactly this rate, and the >10x north-star targets need ~10-20x
more.  The VPU cannot get there; the MXU can.  In RNS, a field element is
a vector of independent small residues:

* multiplication is RESIDUE-WISE (no carry chains, no cross-limb
  shifts/concats — pure elementwise u32 mul + pseudo-Mersenne folds);
* the two Montgomery base extensions are CONSTANT-matrix products
  [lanes, k] x [k, k] — exact bf16 matmuls on the systolic array (8-bit
  operand pieces: products < 2^16, k-term f32 sums < 2^24, all exact);
* additions/subtractions are lazy (no normalization, magnitudes tracked
  statically by the caller as multiples of p).

Algorithm: Cox-Rower style RNS Montgomery (Kawamura et al., EUROCRYPT
2000; Bajard-Imbert fast RNS Montgomery) with
* base A (k moduli, M_A = prod > 2^c_margin * p): the Montgomery "R";
* base B (k moduli, M_B): carries the division by M_A;
* first extension (q: A -> B) approximate — the +alpha*M_A offset only
  adds ~2p to the result bound;
* second extension (r: B -> A) made EXACT by the integer Cox estimate
  with offset beta = 1/2 (valid while r < M_B/2, enforced by base sizing).

mul(x, y) = x*y*M_A^{-1} mod p, with |out| < 3p for any |x|,|y| < c*p
(c = 256, c^2*p <= M_A) — products re-normalize magnitude to 3, and adds
may grow it freely between muls; the RCB formulas in ops/rns_msm.py keep
every mul input <= 144p (bounds annotated per line there).

Moduli: distinct primes in (2^15 - 2^11, 2^15): eps_i = 2^15 - a_i < 2048,
so a residue product < 2^30 folds to < 2^16 with four eps-multiply folds
and two conditional subtracts — ~20 lane-ops, no carries.

This module is the EXACT python/numpy golden model + constant factory.
The jnp/Pallas implementation (ops/rns_jax.py) must match it bit-for-bit;
tests/test_rns.py pins both against plain int arithmetic.

reference analog: gnark-crypto fr/fp Montgomery asm (SURVEY.md §2.4) —
re-designed for a matmul machine rather than a 64-bit scalar ISA.
"""

import functools

import numpy as np


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _pick_moduli(count: int, skip: int = 0):
    """`count` distinct primes a = 2^15 - eps, eps in [1, 2048), largest
    first; `skip` skips the first primes (so base B is disjoint from A)."""
    out = []
    a = (1 << 15) - 1
    while len(out) < count + skip and a > (1 << 15) - 2048:
        if _is_prime(a):
            out.append(a)
        a -= 2
    assert len(out) == count + skip, "not enough pseudo-Mersenne primes"
    return out[skip:]


class RNSBase:
    """One RNS base: moduli, CRT constants, Cox reciprocals."""

    def __init__(self, moduli):
        self.m = list(moduli)
        self.k = len(self.m)
        self.M = 1
        for a in self.m:
            self.M *= a
        self.Mi = [self.M // a for a in self.m]              # M/a_i
        self.Mi_inv = [pow(self.M // a, -1, a) for a in self.m]
        self.eps = [(1 << 15) - a for a in self.m]
        # Cox fixed-point reciprocals: w_i = (sigma_i * R_i) >> 15 underestimates
        # sigma_i * 2^16 / a_i with error < 2 ulp of 2^-16 per term
        self.recip = [(1 << 31) // a for a in self.m]

    def to_rns(self, x: int):
        return [x % a for a in self.m]

    def from_rns(self, res):
        """Exact CRT (python ints, golden only)."""
        x = 0
        for r, a, mi, mii in zip(res, self.m, self.Mi, self.Mi_inv):
            x += (int(r) * mii % a) * mi
        return x % self.M


class RNSSpec:
    """Montgomery-in-RNS for one prime field p.

    Layout contract for the device side: an element is a u32 vector of
    2k residues [base A | base B], each < its modulus (canonical) or
    bounded lazily between muls.
    """

    COX_L = 16        # fixed-point bits of the Cox estimate

    def __init__(self, p: int, k: int | None = None, c_pow: int = 8):
        self.p = p
        # M_A >= c^2 * p with c = 2^c_pow: mul inputs may be up to c*p
        need_bits = p.bit_length() + 2 * c_pow
        if k is None:
            k = -(-(need_bits + 2) // 15) + 1
        self.k = k
        self.c = 1 << c_pow
        self.A = RNSBase(_pick_moduli(k))
        self.B = RNSBase(_pick_moduli(k, skip=k))
        assert self.A.M > (self.c ** 2) * p, "base A too small"
        # second extension exactness: r < 3p must be < M_B / 2
        assert self.B.M > 6 * p, "base B too small"
        self.R = self.A.M % p                     # Montgomery R = M_A
        self.R2 = (self.A.M * self.A.M) % p
        # per-modulus merged constants
        # base A: s_i -> sigma_i = |w_i * (-p^{-1} M_i^{-1})|_{a_i}
        self.qconst = [(-pow(p, -1, a) * pow(self.A.M // a, -1, a)) % a
                       for a in self.A.m]
        # base B: |p|_{b_j}, |M_A^{-1}|_{b_j}, |M_A/a_i|_{b_j}, |M_A|_{b_j}
        self.p_modB = [p % b for b in self.B.m]
        self.MAinv_modB = [pow(self.A.M, -1, b) for b in self.B.m]
        self.ext_AB = np.array(
            [[(self.A.M // a) % b for a in self.A.m] for b in self.B.m],
            dtype=np.int64)                       # [kB, kA]
        self.MA_modB = [self.A.M % b for b in self.B.m]
        # B -> A extension constants: sigma'_j = |r_j * (M_B/b_j)^{-1}|_{b_j}
        self.ext_BA = np.array(
            [[(self.B.M // b) % a for b in self.B.m] for a in self.A.m],
            dtype=np.int64)                       # [kA, kB]
        self.MB_modA = [self.B.M % a for a in self.A.m]

    # ------------------------------------------------- golden (python ints)
    def to_rns(self, x: int):
        """x (any int, taken mod nothing — caller bounds it) -> residue
        list [A | B]."""
        return self.A.to_rns(x) + self.B.to_rns(x)

    def to_mont_rns(self, x: int):
        return self.to_rns(x * self.R % self.p)

    def from_rns_A(self, res):
        return self.A.from_rns(res[:self.k])

    def value(self, res):
        """Exact reconstruction via base A (value < M_A assumed)."""
        return self.from_rns_A(res)

    def _ext_approx(self, resA):
        """Base extension A -> B, approximate (result = v + alpha*M_A for
        some 0 <= alpha <= 1 with the beta=0 floor estimate... golden
        model mirrors the DEVICE integer algorithm exactly."""
        sig = [r * mii % a
               for r, a, mii in zip(resA, self.A.m, self.A.Mi_inv)]
        # cox estimate with beta = 0: alpha_hat <= alpha (may undershoot)
        ws = sum((s * rc) >> 15 for s, rc in zip(sig, self.A.recip))
        alpha = ws >> 16
        out = []
        for j, b in enumerate(self.B.m):
            t = sum(s * int(self.ext_AB[j, i])
                    for i, s in enumerate(sig))
            t -= alpha * self.MA_modB[j]
            out.append(t % b)
        return out, sig, alpha

    def _ext_exact_BA(self, resB):
        """Base extension B -> A, exact while v < M_B/2 (beta = 1/2)."""
        sig = [r * bii % b
               for r, b, bii in zip(resB, self.B.m, self.B.Mi_inv)]
        ws = sum((s * rc) >> 15 for s, rc in zip(sig, self.B.recip))
        alpha = (ws + (1 << 15)) >> 16            # + beta = 1/2
        out = []
        for i, a in enumerate(self.A.m):
            t = sum(s * int(self.ext_BA[i, j])
                    for j, s in enumerate(sig))
            t -= alpha * self.MB_modA[i]
            out.append(t % a)
        return out

    def mul(self, x_res, y_res):
        """Golden RNS Montgomery product: value (x*y*M_A^{-1} mod p)
        + 0..2 extra p; |out| < 3p.  Inputs |x|,|y| < c*p."""
        k = self.k
        wA = [x * y % a for x, y, a in
              zip(x_res[:k], y_res[:k], self.A.m)]
        wB = [x * y % b for x, y, b in
              zip(x_res[k:], y_res[k:], self.B.m)]
        sig = [w * qc % a for w, qc, a in zip(wA, self.qconst, self.A.m)]
        # approximate extension of q (the sigma ARE the extension digits)
        ws = sum((s * rc) >> 15 for s, rc in zip(sig, self.A.recip))
        alpha = ws >> 16
        rB = []
        for j, b in enumerate(self.B.m):
            qj = (sum(s * int(self.ext_AB[j, i]) for i, s in enumerate(sig))
                  - alpha * self.MA_modB[j]) % b
            rB.append((wB[j] + qj * self.p_modB[j])
                      * self.MAinv_modB[j] % b)
        rA = self._ext_exact_BA(rB)
        return rA + rB

    def add(self, x_res, y_res):
        return [(x + y) % m for x, y, m in
                zip(x_res, y_res, self.A.m + self.B.m)]

    def sub(self, x_res, y_res, y_mag: int):
        """x - y + (y_mag)*p to stay positive; caller tracks magnitudes."""
        shift = self.to_rns(y_mag * self.p)
        return [(x - y + s) % m for x, y, s, m in
                zip(x_res, y_res, shift, self.A.m + self.B.m)]


@functools.cache
def fr_rns() -> RNSSpec:
    from ..constants import R_MOD
    return RNSSpec(R_MOD)


@functools.cache
def fp_rns() -> RNSSpec:
    from ..constants import P_MOD
    return RNSSpec(P_MOD)
