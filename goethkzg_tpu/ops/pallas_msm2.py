"""Generalized fused Pippenger bucket kernel: per-instance point sets.

Round-2 extension of ops/pallas_msm.bucket_phase (which is specialised to
one shared 4096-point set): a grid cell per *instance* lets one kernel
launch run

* FK20's 128 per-frequency MSMs of size 64 against the FFT'd SRS table
  (reference: internal/kzg_multi/fk20/toeplitz.go:114 — the reference
  loops 128 separate gnark MultiExps),
* the composite proof map (128 outputs x 128 points per blob) that
  replaces the runtime G1 FFTs (see engines/fk20.py),
* the RLC fold MSMs of the batch verifiers,

with instance-to-input wiring expressed in BlockSpec index maps (static
div/mod of the instance id), so shared point sets or shared digit sets
are never materialised per instance.

Differences from the round-1 kernel:
* bucket state is homogeneous projective and the group law is the
  complete RCB mixed add (ops/pallas_proj.py): 11 muls, one code path,
  no doubling branch (~19 muls before);
* buckets initialise to (0 : 1 : 0) — no Z=0 infinity-promote select.

Digit convention: 8-bit signed windows exactly as pallas_msm.signed_digits
(|d| <= 128, unsigned top window, zero digits and infinity points skipped
via a keep-mask).  Weighted reduction is sum_d (d+1) * B_d, done by the
caller (ops/msm.py msm_instances) on the [NI, C_IN, W, D] bucket output.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_curve import _mod_sub_lm, _sel
from .pallas_proj import proj_add_mixed_lm
from .pallas_msm import signed_digits

L = 128           # lanes: C_IN point chunks x W windows


def _geom(wbits: int):
    W = 256 // wbits            # windows
    D = 1 << (wbits - 1)        # signed bucket count
    C_IN = L // W               # point chunks per step
    return W, D, C_IN


def _sel_map(sel, NI):
    """("id",) | ("div", k) | ("mod", k) -> index-map lambda over (i, t)."""
    kind = sel[0]
    if kind == "id":
        return lambda i, t: (i, t, 0, 0)
    if kind == "div":
        k = sel[1]
        return lambda i, t: (i // k, t, 0, 0)
    if kind == "mod":
        k = sel[1]
        return lambda i, t: (i % k, t, 0, 0)
    raise ValueError(sel)


def _bucket_kernel(pxr, pyr, pinfr, digr, modr, npr, oner,
                   obx, oby, obz, *, n, wbits):
    """Grid (NI, S): instance outer, point-stream inner; out blocks are the
    VMEM-resident projective bucket state [D, n, L] (constant in t)."""
    W, D, C_IN = _geom(wbits)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        obx[0] = jnp.zeros((D, n, L), dtype=jnp.uint32)
        oby[0] = jnp.broadcast_to(oner[:], (D, n, L))      # (0 : 1 : 0)
        obz[0] = jnp.zeros((D, n, L), dtype=jnp.uint32)

    modc, npc = modr[:], npr[:]
    BX, BY, BZ = obx[0], oby[0], obz[0]

    def widen(v):                                   # [m, C_IN] -> [m, L]
        return jnp.concatenate([v] * W, axis=1)     # lane = w*C_IN + ci

    x2 = widen(pxr[0, 0])                           # [n, L]
    y2 = widen(pyr[0, 0])
    pinf = widen(pinfr[0, 0])[0]                    # [L] u32
    packed = digr[0, 0, 0]                          # [L] u32
    idx = (packed & 0xFF).astype(jnp.int32)
    sign = (packed >> 8) & 1
    zero = (packed >> 9) & 1

    neg_y = _mod_sub_lm(jnp.broadcast_to(modc, y2.shape), y2, modc)
    y2 = _sel(sign, neg_y, y2)
    skip = pinf | zero                              # [L] u32 0/1

    iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1, L), 0)
    m = (iota == idx[None, None, :])

    def onehot_row(b):
        masked = jnp.where(m, b, jnp.zeros((), dtype=b.dtype))
        return masked.astype(jnp.int32).sum(axis=0).astype(jnp.uint32)

    X1 = onehot_row(BX)
    Y1 = onehot_row(BY)
    Z1 = onehot_row(BZ)
    X3, Y3, Z3 = proj_add_mixed_lm(X1, Y1, Z1, x2, y2, modc, npc, n)

    keep = m & (skip[None, None, :] == 0)
    obx[0] = jnp.where(keep, jnp.broadcast_to(X3[None], BX.shape), BX)
    oby[0] = jnp.where(keep, jnp.broadcast_to(Y3[None], BY.shape), BY)
    obz[0] = jnp.where(keep, jnp.broadcast_to(Z3[None], BZ.shape), BZ)


@functools.cache
def _consts(n: int, modulus: int, n_prime: int, one_mont: int):
    enc = lambda v: np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                             dtype=np.uint32).reshape(n, 1)
    return enc(modulus), enc(n_prime), enc(one_mont)


@functools.cache
def _build(n: int, modulus: int, n_prime: int, one_mont: int,
           NI: int, S: int, points_sel, digits_sel, wbits: int,
           interpret: bool):
    W, D, C_IN = _geom(wbits)
    kern = functools.partial(_bucket_kernel, n=n, wbits=wbits)
    pmap = _sel_map(points_sel, NI)
    dmap = _sel_map(digits_sel, NI)
    pt = pl.BlockSpec((1, 1, n, C_IN), pmap, memory_space=pltpu.VMEM)
    pi = pl.BlockSpec((1, 1, 1, C_IN), pmap, memory_space=pltpu.VMEM)
    dg = pl.BlockSpec((1, 1, 1, L), dmap, memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((n, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((1, D, n, L), lambda i, t: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)

    def call(pxc, pyc, pinfc, packed, modc, npc, onec):
        out_shape = [jax.ShapeDtypeStruct((NI, D, n, L), jnp.uint32)] * 3
        return pl.pallas_call(
            kern,
            grid=(NI, S),
            in_specs=[pt, pt, pi, dg, cst, cst, cst],
            out_specs=[ob] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(pxc, pyc, pinfc, packed, modc, npc, onec)

    return call


def pack_digits_inst(scalars_normal, wbits: int = 8):
    """[G, N, 16] scalars -> packed digit stream [G, S, 1, L].

    Point j of an instance lands in chunk ci = j // S at step t = j % S;
    lane = w * C_IN + ci.
    """
    W, D, C_IN = _geom(wbits)
    G, N = scalars_normal.shape[:2]
    S = N // C_IN
    idx, sign, zero = signed_digits(scalars_normal, wbits)   # [G, N, W]
    packed = (idx.astype(jnp.uint32)
              | (sign.astype(jnp.uint32) << 8)
              | (zero.astype(jnp.uint32) << 9))
    packed = packed.reshape(G, C_IN, S, W).transpose(0, 2, 3, 1)
    return packed.reshape(G, S, 1, L)


def prep_points(px, py, pinf, wbits: int = 8):
    """[G, N(, n)] affine point sets -> chunked [G, S, n, C_IN] streams."""
    W, D, C_IN = _geom(wbits)
    G, N = pinf.shape
    n = px.shape[-1]
    S = N // C_IN
    pxc = px.reshape(G, C_IN, S, n).transpose(0, 2, 3, 1)
    pyc = py.reshape(G, C_IN, S, n).transpose(0, 2, 3, 1)
    pinfc = pinf.astype(jnp.uint32).reshape(G, C_IN, S, 1).transpose(
        0, 2, 3, 1)
    return pxc, pyc, pinfc


def bucket_phase_inst(spec, points_prepped, packed_digits, NI: int,
                      points_sel=("id",), digits_sel=("id",),
                      wbits: int = 8, interpret: bool = False):
    """Projective bucket phase over NI instances.

    points_prepped: (pxc, pyc, pinfc) from prep_points; packed_digits from
    pack_digits_inst.  points_sel/digits_sel wire instance i to a row of
    the respective array: ("id",), ("div", k) -> row i // k, or
    ("mod", k) -> row i % k.

    Returns projective bucket tuple [NI, C_IN, W, D, n]: index d holds the
    sum of points whose signed digit magnitude is d+1.
    """
    W, D, C_IN = _geom(wbits)
    n = spec.n
    pxc, pyc, pinfc = points_prepped
    S = pxc.shape[1]
    modc, npc, onec = _consts(n, spec.modulus, spec.n_prime, spec.R_mod)
    call = _build(n, spec.modulus, spec.n_prime, spec.R_mod, NI, S,
                  tuple(points_sel), tuple(digits_sel), wbits, interpret)
    obx, oby, obz = call(pxc, pyc, pinfc, packed_digits, modc, npc, onec)

    def unpack(o):                    # [NI, D, n, L] -> [NI, C_IN, W, D, n]
        o = o.reshape(NI, D, n, W, C_IN)
        return o.transpose(0, 4, 3, 1, 2)

    return unpack(obx), unpack(oby), unpack(obz)
