"""EXPERIMENT: Montgomery mul with constant-operand convolutions on the MXU.

The measured commit path is op-count-bound on the VPU: one Fp Montgomery
product costs ~13.5k lane-ops, of which the two constant-operand banded
convolutions (x N' mod R and x modulus) are ~45%.  Those two are exactly
matrix-vector products with FIXED band matrices — so they can run on the
MXU (systolic array) as f32 matmuls over 8-bit sub-limbs, in parallel
with the VPU's variable conv + carry work:

    cols8[w] = sum_u a8[u] * c8[w - u]          (c = N' or modulus)

* operands split into 8-bit digits: products < 2^16, banded sums of at
  most 2n = 48 terms < 2^22 — EXACT in f32 (24-bit mantissa);
* a8 is laid out [lo limbs (n) ; hi limbs (n)] — two cheap masks, no
  sublane interleave — and the band columns are permuted to match;
* 8-bit output columns come back as TWO matmuls (even / odd 16-bit
  column parity), recombined as even + (odd << 8) < 2^31, which the
  existing Kogge-Stone column propagation already tolerates.

Bit-identical to FieldSpec.mul / pallas_field.mont_mul (asserted by
tests/test_mxu.py in interpret mode).  Wired into the sweep harness
(tools/sweep.py stage "mxu") to measure the VPU/MXU overlap on the real
chip before threading it through the group-law kernels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import BLOCK, _conv, _ks_carry, _propagate


def _split8(x):
    """[n, L] u32 16-bit limbs -> [2n, L] f32: rows 0..n-1 = low bytes,
    rows n..2n-1 = high bytes (band columns are permuted to match)."""
    lo = (x & 0xFF).astype(jnp.float32)
    hi = (x >> 8).astype(jnp.float32)
    return jnp.concatenate([lo, hi], axis=0)


@functools.cache
def _bands(c_int: int, n: int, n_cols16: int):
    """Even/odd-parity band matrices [n_cols16, 2n] f32 for the constant
    c: out16[k] = even_row_k . a8 + 256 * (odd_row_k . a8)."""
    c8 = [(c_int >> (8 * v)) & 0xFF for v in range(2 * n)]
    pos = [2 * u for u in range(n)] + [2 * u + 1 for u in range(n)]
    even = np.zeros((n_cols16, 2 * n), np.float32)
    odd = np.zeros((n_cols16, 2 * n), np.float32)
    for k in range(n_cols16):
        for u in range(2 * n):
            v = 2 * k - pos[u]
            if 0 <= v < 2 * n:
                even[k, u] = c8[v]
            v = 2 * k + 1 - pos[u]
            if 0 <= v < 2 * n:
                odd[k, u] = c8[v]
    return even, odd


def _conv_const_mxu(x, even_ref, odd_ref):
    """Banded product with a constant via two MXU matmuls; returns u32
    16-bit-spaced columns [n_cols16, L] (values < 2^31)."""
    x8 = _split8(x)
    ev = jax.lax.dot(even_ref[:], x8,
                     preferred_element_type=jnp.float32)
    od = jax.lax.dot(odd_ref[:], x8,
                     preferred_element_type=jnp.float32)
    evu = ev.astype(jnp.int32).astype(jnp.uint32)
    odu = od.astype(jnp.int32).astype(jnp.uint32)
    return evu + (odu << 8)


def _mont_mul_mxu_kernel(a_ref, b_ref, modc_ref, ne_ref, no_ref,
                         me_ref, mo_ref, o_ref, *, n):
    a = a_ref[:]
    b = b_ref[:]
    modc = modc_ref[:]                                 # [n, 1]
    t_cols, t_top = _conv(a, b, n, 2 * n)              # VPU (both variable)
    t_low, _ = _propagate(t_cols[:n])
    m_cols = _conv_const_mxu(t_low, ne_ref, no_ref)    # MXU: x N' mod R
    m, _ = _propagate(m_cols)
    mn_cols = _conv_const_mxu(m, me_ref, mo_ref)       # MXU: x modulus, full
    total = t_cols + mn_cols
    _, low_carry = _propagate(total[:n])
    high = total[n:]
    high = jnp.concatenate([(high[0] + low_carry)[None, :], high[1:]], axis=0)
    limbs, carry = _propagate(high)
    carry = carry + t_top                              # mn fully captured
    comp = 0xFFFF - modc
    s = limbs + comp
    s = jnp.concatenate([(s[0] + 1)[None, :], s[1:]], axis=0)
    d, ks_carry = _ks_carry(s)
    use_sub = (carry > 0) | (ks_carry == 1)
    o_ref[:] = jnp.where(use_sub[None, :], d, limbs)


@functools.cache
def _build(n: int, modulus: int, n_prime: int, interpret: bool):
    kern = functools.partial(_mont_mul_mxu_kernel, n=n)

    def call(aT, bT, modc, ne, no, me, mo):
        N = aT.shape[1]
        spec = pl.BlockSpec((n, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        bspec = lambda r: pl.BlockSpec((r, 2 * n), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, N), jnp.uint32),
            in_specs=[spec, spec, cspec, bspec(n), bspec(n),
                      bspec(2 * n), bspec(2 * n)],
            out_specs=spec,
            grid=(N // BLOCK,),
            interpret=interpret,
        )(aT, bT, modc, ne, no, me, mo)

    return call


def mont_mul_mxu(spec, a, b, interpret: bool = False):
    """Montgomery product, bit-identical to spec.mul, with the constant
    convolutions on the MXU.  Shapes [..., n] -> [..., n]."""
    n = spec.n
    a, b = jnp.broadcast_arrays(a, b)
    lead = a.shape[:-1]
    N = int(np.prod(lead, dtype=np.int64)) if lead else 1
    Np = max(BLOCK, ((N + BLOCK - 1) // BLOCK) * BLOCK)
    af = a.reshape(N, n)
    bf = b.reshape(N, n)
    if Np != N:
        pad = jnp.zeros((Np - N, n), dtype=jnp.uint32)
        af = jnp.concatenate([af, pad], axis=0)
        bf = jnp.concatenate([bf, pad], axis=0)
    modc = np.array([(spec.modulus >> (16 * i)) & 0xFFFF for i in range(n)],
                    dtype=np.uint32).reshape(n, 1)
    ne, no = _bands(spec.n_prime, n, n)
    me, mo = _bands(spec.modulus, n, 2 * n)
    call = _build(n, spec.modulus, spec.n_prime, interpret)
    out = call(af.T, bf.T, modc, ne, no, me, mo).T
    return out[:N].reshape(lead + (n,))
