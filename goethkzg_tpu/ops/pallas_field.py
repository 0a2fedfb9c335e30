"""Pallas TPU kernel for Montgomery multiplication (the #1 primitive).

Why: the jnp banded-convolution formulation (field.py) materializes the
[lanes, n, 2n] partial-product tensor in HBM — ~5 KB of traffic per
multiply — and saturates HBM bandwidth at ~28 Mmul/s (measured).  This
kernel keeps the entire product/reduce pipeline in VMEM: HBM traffic is
just the operands and the result (~300 B per multiply).

Layout: elements are processed limb-major — the wrapper transposes
[N, n] -> [n, N] so the lane (=128) axis of every VMEM tile is the batch
axis and the n=16/24 limb axis sits on sublanes.  All limb loops are
static Python loops; every op inside the kernel is a [*, BLOCK] vector op.

The algorithm is the same three-banded-convolution Montgomery product as
FieldSpec.mul (full product, m = T*N' mod R, T + m*N), with the same
Kogge-Stone carry resolution, so results are bit-identical.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512


def _shift_up(x, sh):
    """Along axis 0, zero-fill."""
    pad = jnp.zeros((sh,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-sh]], axis=0)


def _ks_carry(v):
    """Kogge-Stone carry resolution along axis 0 of v [m, B], entries < 2^17.

    Returns (limbs [m, B] < 2^16, carry_out [B])."""
    m = v.shape[0]
    # 0/1 uint32 masks (Mosaic can't relayout i1 vectors through concat):
    # v < 2^17 so v >> 16 is the generate bit; propagate = (low16 == 0xFFFF).
    G = v >> 16
    P = ((v & 0xFFFF) + 1) >> 16
    sh = 1
    while sh < m:
        G = G | (P & _shift_up(G, sh))
        P = P & _shift_up(P, sh)
        sh *= 2
    c = _shift_up(G, 1)
    out = (v + c) & 0xFFFF
    return out, G[m - 1]


def _propagate(cols):
    """Columns (< 2^27) -> 16-bit limbs + multi-bit carry_out [B]."""
    lo = cols & 0xFFFF
    hi = cols >> 16
    v = lo + _shift_up(hi, 1)
    limbs, c = _ks_carry(v)
    return limbs, c + hi[cols.shape[0] - 1]


def _conv(a, bvec, n, n_cols):
    """Banded product: cols[k] = sum_i a_i * bvec_{k-i}, truncated to n_cols.

    a: [n, B]; bvec: [n, B] (vector operand) or [n, 1] (constant operand).
    Returns (cols [n_cols, B], top [B] hi-overflow past the last column).
    """
    B = a.shape[1]
    lo = jnp.zeros((n_cols, B), dtype=jnp.uint32)
    hi = jnp.zeros((n_cols, B), dtype=jnp.uint32)
    top_hi = jnp.zeros((B,), dtype=jnp.uint32)
    for i in range(n):
        width = min(n, n_cols - i)
        if width <= 0:
            break
        prod = a[i][None, :] * bvec[:width]      # [width, B] exact 16x16

        def place(x):
            parts = []
            if i:
                parts.append(jnp.zeros((i, B), dtype=jnp.uint32))
            parts.append(x)
            post = n_cols - i - width
            if post:
                parts.append(jnp.zeros((post, B), dtype=jnp.uint32))
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

        lo = lo + place(prod & 0xFFFF)
        hi = hi + place(prod >> 16)
    cols = lo + _shift_up(hi, 1)
    return cols, hi[n_cols - 1]


def _mont_mul_kernel(a_ref, b_ref, modc_ref, npc_ref, o_ref, *, n):
    a = a_ref[:]
    b = b_ref[:]
    modc = modc_ref[:]          # [n, 1]
    npc = npc_ref[:]            # [n, 1]
    t_cols, t_top = _conv(a, b, n, 2 * n)
    t_low, _ = _propagate(t_cols[:n])
    m_cols, _ = _conv(t_low, npc, n, n)
    m, _ = _propagate(m_cols)
    mn_cols, mn_top = _conv(m, modc, n, 2 * n)
    total = t_cols + mn_cols
    _, low_carry = _propagate(total[:n])
    high = total[n:]
    high = jnp.concatenate([(high[0] + low_carry)[None, :], high[1:]], axis=0)
    limbs, carry = _propagate(high)
    carry = carry + t_top + mn_top
    # conditional subtract of the modulus: limbs + carry*2^16n < 2*mod
    comp = (0xFFFF - modc)                       # [n, 1]
    s = limbs + comp
    s = jnp.concatenate([(s[0] + 1)[None, :], s[1:]], axis=0)
    d, ks_carry = _ks_carry(s)
    borrow_is_zero = ks_carry == 1
    use_sub = (carry > 0) | borrow_is_zero
    o_ref[:] = jnp.where(use_sub[None, :], d, limbs)


@functools.cache
def _build_mul(n: int, modulus: int, n_prime: int):
    kern = functools.partial(_mont_mul_kernel, n=n)

    def call(aT, bT, modc, npc):
        N = aT.shape[1]
        grid = (N // BLOCK,)
        spec = pl.BlockSpec((n, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, N), jnp.uint32),
            in_specs=[spec, spec, cspec, cspec],
            out_specs=spec,
            grid=grid,
        )(aT, bT, modc, npc)

    return call


@functools.cache
def _consts(n: int, modulus: int, n_prime: int):
    mod_np = np.array([(modulus >> (16 * i)) & 0xFFFF for i in range(n)],
                      dtype=np.uint32).reshape(n, 1)
    np_np = np.array([(n_prime >> (16 * i)) & 0xFFFF for i in range(n)],
                     dtype=np.uint32).reshape(n, 1)
    return mod_np, np_np


def mont_mul(spec, a, b):
    """Montgomery product via the Pallas kernel; shapes [..., n] -> [..., n].

    Bit-identical to spec.mul.  Pads the flattened lane count to BLOCK.
    """
    n = spec.n
    a, b = jnp.broadcast_arrays(a, b)
    lead = a.shape[:-1]
    N = 1
    for d in lead:
        N *= d
    Np = max(BLOCK, ((N + BLOCK - 1) // BLOCK) * BLOCK)
    af = a.reshape(N, n)
    bf = b.reshape(N, n)
    if Np != N:
        pad = jnp.zeros((Np - N, n), dtype=jnp.uint32)
        af = jnp.concatenate([af, pad], axis=0)
        bf = jnp.concatenate([bf, pad], axis=0)
    modc, npc = _consts(n, spec.modulus, spec.n_prime)
    call = _build_mul(n, spec.modulus, spec.n_prime)
    out = call(af.T, bf.T, modc, npc).T
    return out[:N].reshape(lead + (n,))


def mont_sqr(spec, a):
    return mont_mul(spec, a, a)
