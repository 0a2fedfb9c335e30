"""One-launch constant-exponent power chains (Pallas TPU kernel).

The verify paths contain long SEQUENTIAL exponentiation chains — the
decode sqrt y = (x^3+4)^((p+1)/4) (~480 muls), Fermat inversions a^(p-2)
inside to_affine / batch_inv (~500 muls) — that the field-level kernel
executes as hundreds of separate Pallas launches with limb-major
transposes around each (measured ~26 ms for the sqrt chain at 256 lanes
vs ~0.9 ms of mul compute, tools/probe_verify.py).  This kernel runs the
ENTIRE windowed-exponent chain in one launch: the 2^w-entry table is
built in VMEM and a fori_loop walks the exponent digits (SMEM), doing
w in-VMEM squarings + one one-hot table mul per digit.

Bit-identical to FieldSpec.pow_const_windowed (same Montgomery multiply
as ops/pallas_field.py, same digit schedule).

reference analog: gnark-crypto's addchain-generated Sqrt/Inverse
(SURVEY.md §2.4) — the TPU design trades the addchain's minimal mul
count for a uniform in-kernel loop with zero launch overhead.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import BLOCK
from .pallas_curve import _mont_mul_lm


def _digit_schedule(exponent: int, wbits: int) -> np.ndarray:
    nbits = max(exponent.bit_length(), 1)
    nw = -(-nbits // wbits)
    return np.asarray(
        [(exponent >> (wbits * (nw - 1 - i))) & ((1 << wbits) - 1)
         for i in range(nw)], dtype=np.int32).reshape(1, nw)


def _pow_kernel(ar, digr, modr, npr, oner, o, *, n, wbits, nw):
    a = ar[:]
    modc, npc = modr[:], npr[:]
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    one = jnp.broadcast_to(oner[:], a.shape)
    D = 1 << wbits
    tab = [one, a]
    for _ in range(2, D):
        tab.append(mul(tab[-1], a))
    tabs = jnp.stack(tab)                    # [D, n, B]
    iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1, 1), 0)

    def body(i, acc):
        for _ in range(wbits):
            acc = mul(acc, acc)
        d = digr[0, i]
        m = iota == d
        # exactly one row matches; limbs < 2^16 so the i32 sum is exact
        sel = jnp.where(m, tabs, 0).astype(jnp.int32).sum(
            axis=0).astype(jnp.uint32)
        return mul(acc, sel)

    o[:] = jax.lax.fori_loop(0, nw, body, one)


@functools.cache
def _consts(n: int, modulus: int, n_prime: int, one_mont: int):
    enc = lambda v: np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                             dtype=np.uint32).reshape(n, 1)
    return enc(modulus), enc(n_prime), enc(one_mont)


@functools.cache
def _build(n: int, modulus: int, n_prime: int, one_mont: int,
           exponent: int, wbits: int, interpret: bool):
    digits = _digit_schedule(exponent, wbits)
    nw = digits.shape[1]
    kern = functools.partial(_pow_kernel, n=n, wbits=wbits, nw=nw)

    def call(aT, modc, npc, onec):
        N = aT.shape[1]
        grid = (N // BLOCK,)
        spec = pl.BlockSpec((n, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        cspec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, N), jnp.uint32),
            in_specs=[spec, dspec, cspec, cspec, cspec],
            out_specs=spec,
            grid=grid,
            interpret=interpret,
        )(aT, jnp.asarray(digits), modc, npc, onec)

    return call


def pow_const(spec, a, exponent: int, wbits: int = 4,
              interpret: bool = False):
    """a^exponent (Montgomery in/out), whole chain in one kernel launch.

    a: [..., n] uint32 16-bit limbs.  Pads the flattened lane count to
    BLOCK, so even a 2-lane inversion costs exactly one launch.
    """
    n = spec.n
    lead = a.shape[:-1]
    N = 1
    for d in lead:
        N *= d
    Np = max(BLOCK, ((N + BLOCK - 1) // BLOCK) * BLOCK)
    af = a.reshape(N, n)
    if Np != N:
        af = jnp.concatenate(
            [af, jnp.zeros((Np - N, n), dtype=jnp.uint32)], axis=0)
    modc, npc, onec = _consts(n, spec.modulus, spec.n_prime, spec.R_mod)
    call = _build(n, spec.modulus, spec.n_prime, spec.R_mod,
                  int(exponent), wbits, interpret)
    out = call(af.T, modc, npc, onec).T
    return out[:N].reshape(lead + (n,))
