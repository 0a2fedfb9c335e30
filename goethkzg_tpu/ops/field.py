"""TPU-native prime-field arithmetic: 16-bit limbs in uint32 lanes.

Design (TPU-first, not a port — reference keeps this in gnark-crypto's
x86/ARM assembly, SURVEY.md §2.4):

* A field element is a little-endian vector of 16-bit limbs stored in a
  uint32 array of shape [..., n].  Fr (255-bit) uses n=16, Fp (381-bit) n=24.
* Elements live in Montgomery form with R = 2^(16 n).
* Montgomery multiplication is computed as three *vectorized banded
  convolutions* (a*b full product, m = T*N' mod R, m*N), each lowered to a
  single broadcast-multiply + hi/lo split + reduction over the limb axis —
  big fused VPU ops with no data-dependent control flow.  Only the carry
  normalization is a (short, unrolled) sequential chain.
* 16x16-bit limb products are exact in uint32; column sums of the split
  hi/lo parts stay < 2^22, so nothing ever overflows a uint32 lane.

Everything here is jit-compatible and vectorizes over arbitrary leading
batch dimensions.
"""

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = np.uint32(0xFFFF)   # host scalar: a jnp scalar would be a device
U32 = np.uint32              # constant and stall first lowerings (see below)

# ---------------------------------------------------------------------------
# Pallas dispatch: the Montgomery multiply runs as a VMEM-resident Pallas
# kernel on TPU (5-6x the HBM-bound jnp formulation, see ops/pallas_field.py)
# whenever (a) the flag allows it, (b) the default backend is a TPU, and
# (c) there are enough lanes to fill a block.  CPU-mesh code (tests,
# dryrun_multichip) disables it via `pallas_disabled()` since Mosaic kernels
# don't lower on the CPU backend.
# ---------------------------------------------------------------------------
_PALLAS_TLS = threading.local()


def _pallas_enabled() -> bool:
    if os.environ.get("GOETHKZG_NO_PALLAS") == "1":
        return False
    if getattr(_PALLAS_TLS, "disabled", 0):
        return False
    try:
        # strictly TPU: the kernels use pltpu (Mosaic) memory spaces and do
        # not lower on CUDA/ROCm/METAL backends
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class pallas_disabled:
    """Context manager: force the jnp field path (for CPU-backend traces)."""

    def __enter__(self):
        _PALLAS_TLS.disabled = getattr(_PALLAS_TLS, "disabled", 0) + 1
        return self

    def __exit__(self, *exc):
        _PALLAS_TLS.disabled -= 1
        return False


_PALLAS_MIN_LANES = 256


def int_to_limbs(x: int, n: int) -> np.ndarray:
    """Python int -> np.uint32[n] little-endian 16-bit limbs."""
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(n)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    out = 0
    for i, l in enumerate(np.asarray(limbs, dtype=np.uint64).tolist()):
        out |= int(l) << (16 * i)
    return out


class FieldSpec:
    """All derived constants + jnp ops for one prime field."""

    def __init__(self, name: str, modulus: int, n_limbs: int):
        assert modulus < (1 << (16 * n_limbs))
        self.name = name
        self.modulus = modulus
        self.n = n_limbs
        self.R = 1 << (16 * n_limbs)
        self.R_mod = self.R % modulus
        self.R2_mod = (self.R * self.R) % modulus
        # N' = -N^{-1} mod R (full-width, for reduction-by-multiplication)
        self.n_prime = (-pow(modulus, -1, self.R)) % self.R

        # All constants are HOST numpy arrays, never device arrays: a
        # closed-over device constant forces a device->host fetch at every
        # first lowering (over a remote-TPU tunnel that is seconds to
        # minutes); numpy constants embed directly into the module.
        n = self.n
        self.mod_limbs = int_to_limbs(modulus, n)
        self.np_limbs = int_to_limbs(self.n_prime, n)
        self.one_mont = int_to_limbs(self.R_mod, n)
        self.r2_limbs = int_to_limbs(self.R2_mod, n)
        self.zero = np.zeros((n,), dtype=np.uint32)
        # Interface shared with Fp2Field for generic curve code:
        self.zero_elem = self.zero
        self.one_elem = self.one_mont
        self.trailing_dims = 1

        # Banded-convolution gather index/mask: for output column k and
        # operand-row i, we need b[k - i] (zero when out of range).
        # full product: k in [0, 2n); low product: k in [0, n).
        def band(n_cols):
            idx = np.zeros((n, n_cols), dtype=np.int32)
            msk = np.zeros((n, n_cols), dtype=np.uint32)
            for i in range(n):
                for k in range(n_cols):
                    j = k - i
                    if 0 <= j < n:
                        idx[i, k] = j
                        msk[i, k] = 1
            return idx, msk

        self._idx_full, self._msk_full = band(2 * n)
        self._idx_low, self._msk_low = band(n)

    # -- low-level building blocks -------------------------------------------

    @staticmethod
    def _shift_up(a, sh, fill=False):
        """result[..., k] = a[..., k-sh] (toward higher limb indices)."""
        pad = jnp.full(a.shape[:-1] + (sh,), fill, dtype=a.dtype)
        return jnp.concatenate([pad, a[..., :-sh]], axis=-1)

    def _ks(self, v):
        """Kogge–Stone carry resolution for v [..., m] with entries < 2^17 - 1.

        Returns (limbs [..., m] < 2^16, carry_out [...] in {0, 1}).
        Log-depth instead of the sequential ripple chain — 5 rounds for 24
        limbs instead of 24 dependent steps.
        """
        m = v.shape[-1]
        G = (v >> 16) == 1
        Pp = (v & MASK16) == MASK16
        sh = 1
        while sh < m:
            G = G | (Pp & self._shift_up(G, sh))
            Pp = Pp & self._shift_up(Pp, sh)
            sh *= 2
        c = self._shift_up(G, 1).astype(jnp.uint32)
        out = (v + c) & MASK16
        return out, G[..., -1].astype(jnp.uint32)

    def _propagate_cols(self, cols):
        """Resolve accumulated columns (< 2^27) into 16-bit limbs.

        Returns (limbs, carry_out) where carry_out may be multi-bit.
        """
        lo = cols & MASK16
        hi = cols >> 16
        v = lo + self._shift_up(hi, 1)  # < 2^16 + 2^11
        limbs, c = self._ks(v)
        return limbs, c + hi[..., -1]

    def _conv(self, a, b, idx, msk):
        """Column sums of the banded product: cols[k] = sum_i a_i * b_{k-i}.

        Returns (lo_cols, hi_cols) where the true column value is
        lo_cols[k] + (hi_cols[k-1] << 16) accumulated; we return them merged:
        cols[k] = lo_sum[k] + hi_sum shifted by one column.
        Bound: each < n * 0xffff < 2^21.
        """
        # gathered b: [..., n, n_cols]
        bg = jnp.asarray(b)[..., idx] * msk   # coerce: .at[] below is jnp-only
        prod = jnp.asarray(a)[..., :, None] * bg  # exact u32 (16x16)
        lo = (prod & MASK16).sum(axis=-2, dtype=jnp.uint32)
        hi = (prod >> 16).sum(axis=-2, dtype=jnp.uint32)
        # merge: hi of column k contributes to column k+1
        cols = lo.at[..., 1:].add(hi[..., :-1])
        return cols, hi[..., -1]  # (columns, carry-out beyond last column)

    def _cond_sub_mod(self, limbs, extra):
        """Reduce a value (extra*2^16n + limbs) < 2*mod into [0, mod)."""
        d, borrow = self._sub_raw(limbs, self.mod_limbs)
        use_sub = (extra > 0) | (borrow == 0)
        return jnp.where(use_sub[..., None], d, limbs)

    def _sub_raw(self, a, b):
        """a - b via 16-bit complement addition; returns (limbs, borrow)."""
        comp = MASK16 - b
        s = jnp.asarray(a + comp).at[..., 0].add(1)  # a + (2^16n-1-b) + 1
        limbs, carry = self._ks(s)
        return limbs, U32(1) - carry

    # -- public ops ------------------------------------------------------------

    def add(self, a, b):
        limbs, carry = self._ks(a + b)
        return self._cond_sub_mod(limbs, carry)

    def sub(self, a, b):
        d, borrow = self._sub_raw(a, b)
        # if borrowed, add modulus back
        fix = jnp.where(borrow[..., None].astype(bool),
                        self.mod_limbs, jnp.zeros_like(self.mod_limbs))
        limbs, _ = self._ks(d + fix)
        return limbs

    def neg(self, a):
        d, _ = self._sub_raw(jnp.broadcast_to(self.mod_limbs, a.shape), a)
        return jnp.where(self.is_zero(a)[..., None], a, d)

    def mul(self, a, b):
        """Montgomery product: a * b * R^{-1} mod N."""
        if _pallas_enabled():
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            lanes = 1
            for d in shape[:-1]:
                lanes *= d
            if lanes >= _PALLAS_MIN_LANES:
                from . import pallas_field
                return pallas_field.mont_mul(self, jnp.broadcast_to(a, shape),
                                             jnp.broadcast_to(b, shape))
        return self._mul_jnp(a, b)

    def _mul_jnp(self, a, b):
        n = self.n
        # T = a * b  (2n columns)
        t_cols, t_top = self._conv(a, b, self._idx_full, self._msk_full)
        # m = (T mod R) * N' mod R : need T's low n limbs propagated first
        # (the propagated view is only for computing m; `t_cols` stays the
        # authoritative accumulator)
        t_low, _ = self._propagate_cols(t_cols[..., :n])
        m_cols, _ = self._conv(t_low, self.np_limbs, self._idx_low, self._msk_low)
        m, _ = self._propagate_cols(m_cols)
        # T + m*N
        mn_cols, mn_top = self._conv(m, self.mod_limbs, self._idx_full, self._msk_full)
        total = t_cols + mn_cols  # columns < 2^22 each, sum < 2^23
        # The low n columns sum to 0 mod R by construction; only their carry
        # into the high half matters.
        _, low_carry = self._propagate_cols(total[..., :n])
        high = total[..., n:]
        high = high.at[..., 0].add(low_carry)
        limbs, carry = self._propagate_cols(high)
        carry = carry + t_top + mn_top
        return self._cond_sub_mod(limbs, carry)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_const(self, a, const_mont):
        return self.mul(a, const_mont)

    def to_mont(self, a):
        return self.mul(a, self.r2_limbs)

    def from_mont(self, a):
        one = jnp.zeros((self.n,), dtype=jnp.uint32).at[0].set(1)
        return self.mul(a, one)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond broadcastable against batch dims; picks a where True."""
        return jnp.where(cond[..., None], a, b)

    def is_lt_modulus(self, a):
        _, borrow = self._sub_raw(a, self.mod_limbs)
        return borrow == 1

    def pow_const(self, a, exponent: int):
        """a^exponent (Montgomery in/out) for a Python-int exponent, via scan."""
        nbits = max(exponent.bit_length(), 1)
        bits = np.asarray(
            [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=np.uint32)

        def body(acc, bit):
            acc2 = self.sqr(acc)
            acc3 = self.mul(acc2, a)
            return self.select((bit == 1), acc3, acc2), None

        # init = 1, built from `a` so it inherits a's varying-axes type
        # (required for scan carries under shard_map)
        init = (a ^ a) + self.one_mont
        out, _ = jax.lax.scan(body, init, bits)
        return out

    def pow_const_windowed(self, a, exponent: int, wbits: int = 4):
        """a^exponent via fixed 4-bit windows: ~35% fewer muls than
        pow_const (wbits squarings + one table mul per window) and a 4x
        shorter scan (faster compiles for the long Fp exponents used by
        sqrt/inversion on the wire-decode path).

        On TPU the whole chain runs as ONE Pallas kernel launch
        (ops/pallas_chain.py) — the per-mul launch + transpose overhead of
        the scan formulation measured ~30x the mul compute itself."""
        if _pallas_enabled():
            from . import pallas_chain
            return pallas_chain.pow_const(self, a, exponent, wbits)
        nbits = max(exponent.bit_length(), 1)
        nw = -(-nbits // wbits)
        digits = np.asarray(
            [(exponent >> (wbits * (nw - 1 - i))) & ((1 << wbits) - 1)
             for i in range(nw)], dtype=np.int32)

        # table of a^0 .. a^(2^wbits - 1); entry 0 built from `a` so every
        # row inherits a's varying-axes type (shard_map scan requirement)
        one = (a ^ a) + self.one_mont
        tab = [one, a]
        for _ in range(2, 1 << wbits):
            tab.append(self.mul(tab[-1], a))
        tab = jnp.stack(tab)

        def body(acc, d):
            for _ in range(wbits):
                acc = self.sqr(acc)
            acc = self.mul(acc, jax.lax.dynamic_index_in_dim(
                tab, d, 0, keepdims=False))
            return acc, None

        out, _ = jax.lax.scan(body, one, digits)
        return out

    def inv(self, a):
        """Batched inversion via Fermat (fully parallel; 0 -> 0).

        On TPU: one pallas_chain launch instead of a ~510-step scan of
        per-mul kernel launches (the scan measured ~29 ms even at 2 lanes,
        tools/probe_verify.py)."""
        if _pallas_enabled():
            return self.pow_const_windowed(a, self.modulus - 2)
        return self.pow_const(a, self.modulus - 2)

    def batch_inv(self, x, zero_to_zero: bool = True):
        """Montgomery-trick batched inversion along axis -2 of x [..., N, n].

        Uses log-depth prefix/suffix product scans (TPU-friendly) plus ONE
        Fermat inversion, ~6N muls total instead of N*255.  Zero entries map
        to zero (gnark BatchInvert semantics).
        """
        N = x.shape[-2]
        one = jnp.broadcast_to(self.one_mont, x.shape)
        zeros = self.is_zero(x)
        safe = jnp.where(zeros[..., None], one, x)

        def incl_scan(v):
            sh = 1
            while sh < N:
                pad = one[..., :sh, :]
                shifted = jnp.concatenate([pad, v[..., :-sh, :]], axis=-2)
                v = self.mul(v, shifted)
                sh *= 2
            return v

        incl_pre = incl_scan(safe)
        incl_suf = incl_scan(safe[..., ::-1, :])[..., ::-1, :]
        excl_pre = jnp.concatenate([one[..., :1, :], incl_pre[..., :-1, :]], axis=-2)
        excl_suf = jnp.concatenate([incl_suf[..., 1:, :], one[..., :1, :]], axis=-2)
        total_inv = self.inv(incl_pre[..., -1, :])
        out = self.mul(self.mul(excl_pre, excl_suf), total_inv[..., None, :])
        if zero_to_zero:
            out = jnp.where(zeros[..., None], jnp.zeros_like(out), out)
        return out

    def sum(self, x, axis=-2):
        """Tree reduction of field elements along `axis` (default element axis)."""
        assert axis == -2
        v = x
        while v.shape[-2] > 1:
            m = v.shape[-2]
            if m % 2 == 1:
                pad = jnp.zeros_like(v[..., :1, :])
                v = jnp.concatenate([v, pad], axis=-2)
            v = self.add(v[..., 0::2, :], v[..., 1::2, :])
        return v[..., 0, :]

    # -- host-side helpers ------------------------------------------------------

    def from_int(self, x: int, mont: bool = True) -> np.ndarray:
        x %= self.modulus
        if mont:
            x = (x * self.R) % self.modulus
        return int_to_limbs(x, self.n)

    def to_int(self, limbs, mont: bool = True) -> int:
        x = limbs_to_int(np.asarray(limbs))
        if mont:
            x = (x * pow(self.R, -1, self.modulus)) % self.modulus
        return x


@functools.cache
def fr_spec() -> FieldSpec:
    from ..constants import R_MOD
    return FieldSpec("fr", R_MOD, 16)


@functools.cache
def fp_spec() -> FieldSpec:
    from ..constants import P_MOD
    return FieldSpec("fp", P_MOD, 24)
