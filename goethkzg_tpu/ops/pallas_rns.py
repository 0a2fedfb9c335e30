"""Pallas TPU kernels for RNS Montgomery arithmetic (round 5).

The positional 16-limb Montgomery mul costs ~13.5k VPU lane-ops and
measures 139 Mmul/s on one v5e chip (PERF.md round 4); every compute-
bound path (commit table-MSM, FK20, evals) is bound by that rate.  The
RNS form (ops/rns.py golden model, ops/rns_jax.py XLA form) cuts the
per-mul lane work to ~60 elementwise passes over the 2k residues with
NO carry chains, and the two Montgomery base extensions become k x k
constant-matrix products that run as exact bf16 matmuls on the MXU —
but the pure-XLA form is HBM-bound at 34 Mmul/s (every pass streams the
[lanes, 2k] residue tensor through HBM).  These kernels keep the whole
pipeline VMEM-resident, which is the difference between 34 Mmul/s and
the VPU/MXU roofline.

Layout: residues-major [2k, B] — the residue axis on sublanes (2k = 56
for Fp = 7 exact (8,128) u32 tiles), the element axis on lanes.  All
constants ride in as small VMEM operands (baked jnp constants stall
Mosaic lowering — see ops/field.py).

Exactness: bit-identical to RNSSpec/RNSOps (pinned by tests/test_rns.py
and tests/test_pallas_rns.py).  The bf16 matmul trick: operands split
into 8-bit pieces (exact in bf16), k-term f32 accumulations < 2^24
(exact), recombined in u32 with pseudo-Mersenne folds.  All casts route
through i32 (Mosaic rejects some unsigned<->float casts on this stack).

reference analog: gnark-crypto's fr/fp Montgomery asm (SURVEY.md §2.4),
re-designed for a vector+matmul machine.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rns import RNSSpec

BLOCK = 512


# ---------------------------------------------------------------- constants

class _Consts:
    """Kernel operand pack for one RNSSpec.

    m_eps [2k, 2] u32       : modulus | eps per residue
    cA    [k, 4]  u32       : qconst | recip_A | MB_modA | padA
    cB    [k, 6]  u32       : recip_B | p_modB | MAinv_modB | MA_modB
                              | BMi_inv | padB
    matAB [2, k, k] bf16    : ext_AB lo/hi bytes   (out_j = sum_i m[j,i] s_i)
    matBA [2, k, k] bf16    : ext_BA lo/hi bytes
    """

    def __init__(self, spec: RNSSpec):
        self.spec = spec
        k = spec.k
        self.k = k
        m_all = np.array(spec.A.m + spec.B.m, dtype=np.uint32)
        eps = (1 << 15) - m_all
        self.m_eps = np.stack([m_all, eps], axis=1)
        padA = ((1 << 21) // m_all[:k] + 1) * m_all[:k]
        padB = ((1 << 21) // m_all[k:] + 1) * m_all[k:]
        self.cA = np.stack([
            np.array(spec.qconst, dtype=np.uint32),
            np.array(spec.A.recip, dtype=np.uint32),
            np.array(spec.MB_modA, dtype=np.uint32),
            padA.astype(np.uint32)], axis=1)
        self.cB = np.stack([
            np.array(spec.B.recip, dtype=np.uint32),
            np.array(spec.p_modB, dtype=np.uint32),
            np.array(spec.MAinv_modB, dtype=np.uint32),
            np.array(spec.MA_modB, dtype=np.uint32),
            np.array(spec.B.Mi_inv, dtype=np.uint32),
            padB.astype(np.uint32)], axis=1)

        def split(mat):
            mat = np.asarray(mat, dtype=np.int64)
            return np.stack([(mat & 0xFF).astype(np.float32),
                             (mat >> 8).astype(np.float32)]).astype(
                np.float32)

        # direct orientation: out[j] = sum_i mat[j, i] * sig[i].
        # Stored as NUMPY (f32 / u32): jnp conversion happens per
        # operands() call — a cached jnp array built inside a jit trace
        # is a leaked tracer for every later jit (UnexpectedTracerError).
        self.matAB = split(spec.ext_AB)
        self.matBA = split(spec.ext_BA)
        self.matAB_u32 = self.matAB.astype(np.uint32)     # [2, k, k]
        self.matBA_u32 = self.matBA.astype(np.uint32)

    def operands(self, mxu: bool = True):
        if mxu:
            mab = jnp.asarray(self.matAB, dtype=jnp.bfloat16)
            mba = jnp.asarray(self.matBA, dtype=jnp.bfloat16)
        else:
            mab = jnp.asarray(self.matAB_u32)
            mba = jnp.asarray(self.matBA_u32)
        return (jnp.asarray(self.m_eps), jnp.asarray(self.cA),
                jnp.asarray(self.cB), mab, mba)


@functools.cache
def consts_for(p: int, k: int) -> _Consts:
    from .rns import fr_rns, fp_rns
    for f in (fr_rns, fp_rns):
        s = f()
        if s.p == p and s.k == k:
            return _Consts(s)
    return _Consts(RNSSpec(p, k))


# ------------------------------------------------------------ in-kernel ops

def _fold(t, m, eps):
    """[x, B] u32 < 2^30 -> canonical < m; m/eps [x, 1]."""
    for _ in range(5):
        t = (t >> 15) * eps + (t & 0x7FFF)
    return jnp.where(t >= m, t - m, t)


def _bf16(x):
    return x.astype(jnp.int32).astype(jnp.bfloat16)


def _dots(mat2, sig):
    """Exact u32 [k_out, B] = int(mat) @ sig via four bf16 MXU matmuls.

    mat2: [2, k_out, k_in] bf16 (lo/hi bytes); sig: [k_in, B] u32 < 2^15.
    Returns the four byte-product f32 sums as u32 (each < k * 2^16)."""
    lo, hi = _bf16(sig & 0xFF), _bf16(sig >> 8)
    f = jnp.float32

    def dot(m, s):
        return jnp.dot(m, s, preferred_element_type=f).astype(
            jnp.int32).astype(jnp.uint32)

    return (dot(mat2[0], lo), dot(mat2[1], lo),
            dot(mat2[0], hi), dot(mat2[1], hi))


def _combine(parts, m, eps):
    """Byte-product sums -> sum mod m (canonical).  true value =
    ll + 2^8 (lh + hl) + 2^16 hh; every intermediate < 2^30."""
    ll, lh, hl, hh = parts
    t = _fold((hh << 8) + lh + hl, m, eps)
    return _fold((t << 8) + ll, m, eps)


def _ext(mat2, sig, m, eps):
    """Base extension digit sum: (sum_i mat[j,i] sig[i]) mod m_j.

    mat2 [2, k_out, k_in]: bf16 byte planes -> four exact MXU matmuls;
    u32 byte planes -> static VPU loop over k_in (acc_lo < k*2^23 < 2^28,
    acc_hi < k*2^22 < 2^27, both exact in u32)."""
    if mat2.dtype == jnp.bfloat16:
        return _combine(_dots(mat2, sig), m, eps)
    mlo, mhi = mat2[0], mat2[1]
    B = sig.shape[1]
    acc_lo = jnp.zeros((mlo.shape[0], B), jnp.uint32)
    acc_hi = jnp.zeros((mlo.shape[0], B), jnp.uint32)
    for i in range(sig.shape[0]):
        s = sig[i][None, :]
        acc_lo = acc_lo + mlo[:, i][:, None] * s
        acc_hi = acc_hi + mhi[:, i][:, None] * s
    t = _fold(acc_hi, m, eps)
    return _fold((t << 8) + acc_lo, m, eps)


def rns_mul(x, y, m_eps, cA, cB, matAB, matBA, *, k):
    """In-kernel RNS Montgomery product, [2k, B] x [2k, B] -> [2k, B].

    Bit-identical to RNSOps.mul / RNSSpec.mul: inputs canonical residues
    of values < 256p, output canonical residues of a value < 3p."""
    m, eps = m_eps[:, 0:1], m_eps[:, 1:2]
    mA, epsA = m[:k], eps[:k]
    mB, epsB = m[k:], eps[k:]
    w = _fold(x * y, m, eps)
    wA, wB = w[:k], w[k:]
    sig = _fold(wA * cA[:, 0:1], mA, epsA)
    # cox sums ride i32 (Mosaic: no unsigned reductions); post-shift
    # terms < 2^17 and k-term sums < 2^22, both exact in i32
    alpha = (jnp.sum(((sig * cA[:, 1:2]) >> 15).astype(jnp.int32),
                     axis=0, dtype=jnp.int32).astype(jnp.uint32)
             >> 16)                                              # [B]
    qB = _ext(matAB, sig, mB, epsB)
    qB = _fold(qB + cB[:, 5:6] - alpha[None, :] * cB[:, 3:4], mB, epsB)
    t = _fold(qB * cB[:, 1:2], mB, epsB)
    s = wB + t
    t = jnp.where(s >= mB, s - mB, s)
    rB = _fold(t * cB[:, 2:3], mB, epsB)
    sig2 = _fold(rB * cB[:, 4:5], mB, epsB)
    alpha2 = (jnp.sum(((sig2 * cB[:, 0:1]) >> 15).astype(jnp.int32),
                      axis=0, dtype=jnp.int32).astype(jnp.uint32)
              + np.uint32(1 << 15)) >> 16
    rA = _ext(matBA, sig2, mA, epsA)
    rA = _fold(rA + cA[:, 3:4] - alpha2[None, :] * cA[:, 2:3], mA, epsA)
    return jnp.concatenate([rA, rB], axis=0)


def rns_add(x, y, m_eps):
    s = x + y
    m = m_eps[:, 0:1]
    return jnp.where(s >= m, s - m, s)


def rns_sub(x, y, shift, m_eps):
    """x - y + shift where shift [2k, 1] encodes y_mag * p (caller-built
    canonical residues); matches RNSOps.sub's double conditional."""
    m = m_eps[:, 0:1]
    s = x + shift + m - y
    s = jnp.where(s >= m, s - m, s)
    return jnp.where(s >= m, s - m, s)


# ------------------------------------------------------- standalone mul op

def _mul_kernel(x_ref, y_ref, me_ref, cA_ref, cB_ref, mAB_ref, mBA_ref,
                o_ref, *, k, depth):
    x = x_ref[:]
    y = y_ref[:]
    out = rns_mul(x, y, me_ref[:], cA_ref[:], cB_ref[:], mAB_ref[:],
                  mBA_ref[:], k=k)
    # mul-rate benches chain `depth` dependent muls to defeat latency
    # hiding; functional tests use depth=1
    for _ in range(depth - 1):
        out = rns_mul(out, y, me_ref[:], cA_ref[:], cB_ref[:], mAB_ref[:],
                      mBA_ref[:], k=k)
    o_ref[:] = out


@functools.cache
def _build_mul(p: int, k: int, depth: int, interpret: bool):
    kern = functools.partial(_mul_kernel, k=k, depth=depth)

    def call(xT, yT, me, cA, cB, mAB, mBA):
        N = xT.shape[1]
        spec = pl.BlockSpec((2 * k, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

        def cspec(a):
            return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((2 * k, N), jnp.uint32),
            in_specs=[spec, spec, cspec(me), cspec(cA), cspec(cB),
                      cspec(mAB), cspec(mBA)],
            out_specs=spec,
            grid=(N // BLOCK,),
            interpret=interpret,
        )(xT, yT, me, cA, cB, mAB, mBA)

    return call


def mont_mul_rns(spec: RNSSpec, x, y, depth: int = 1,
                 interpret: bool = False, mxu: bool = True):
    """RNS Montgomery product via the Pallas kernel.

    x, y: [..., 2k] canonical u32 residue arrays (RNSOps layout).
    Returns [..., 2k].  Bit-identical to RNSOps.mul (iterated `depth`
    times with y for kernel-rate benchmarking)."""
    k = spec.k
    c = consts_for(spec.p, k)
    lead = x.shape[:-1]
    N = int(np.prod(lead)) if lead else 1
    Np = max(BLOCK, -(-N // BLOCK) * BLOCK)
    xf = jnp.asarray(x).reshape(N, 2 * k)
    yf = jnp.broadcast_to(jnp.asarray(y), x.shape).reshape(N, 2 * k)
    if Np != N:
        pad = jnp.zeros((Np - N, 2 * k), dtype=jnp.uint32)
        xf = jnp.concatenate([xf, pad])
        yf = jnp.concatenate([yf, pad])
    call = _build_mul(spec.p, k, depth, interpret)
    out = call(xf.T, yf.T, *c.operands(mxu))
    return out.T[:N].reshape(lead + (2 * k,))


# --------------------------------------------------------- RNS curve ops

def _mul12(v, m_eps):
    v2 = rns_add(v, v, m_eps)
    v4 = rns_add(v2, v2, m_eps)
    v8 = rns_add(v4, v4, m_eps)
    return rns_add(v8, v4, m_eps)


def rns_mixed_add(P1, a2, me, cA, cB, mAB, mBA, shifts, *, k):
    """Complete RCB projective mixed add over in-kernel RNS ops.

    Same algorithm + magnitude discipline as rns_msm.RNSCurve.mixed_add
    (inputs X1,Y1,Z1 < 6p, x2,y2 < 3p, outputs < 6p; every mul input
    <= 144p < 256p).  shifts: [2k, 3] canonical residues of (3p, 6p, 72p).
    """
    mul = lambda a, b: rns_mul(a, b, me, cA, cB, mAB, mBA, k=k)
    add = lambda a, b: rns_add(a, b, me)
    sub = lambda a, b, col: rns_sub(a, b, shifts[:, col:col + 1], me)
    X1, Y1, Z1 = P1
    x2, y2 = a2
    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = mul(add(X1, Y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1), 1)
    t4 = add(mul(y2, Z1), Y1)
    Y3 = add(mul(x2, Z1), X1)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = _mul12(Z1, me)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2, 2)
    Y3 = _mul12(Y3, me)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3, 0)
    Y3 = mul(Y3, t0)
    Y3 = add(mul(t1, Z3), Y3)
    t0 = mul(t0, t3)
    Z3 = add(mul(Z3, t4), t0)
    return X3, Y3, Z3


# ------------------------------------------------------ fixed-base table MSM

def _rns_table_msm_kernel(txr, tyr, digr, me_ref, cA_ref, cB_ref, mAB_ref,
                          mBA_ref, onec_ref, sh_ref, ox, oy, oz, *, k, D):
    """Grid (BT, PT, TB): same streaming structure as the positional
    pallas_tablemsm kernel — accumulator block VMEM-resident across every
    (pt, b) step, u16 table tile fetched once per (bt, pt)."""
    pt = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when((pt == 0) & (b == 0))
    def _():
        ox[...] = jnp.zeros_like(ox)
        oy[...] = jnp.broadcast_to(onec_ref[:], oy.shape)   # (0 : 1 : 0)
        oz[...] = jnp.zeros_like(oz)

    me, cA, cB = me_ref[:], cA_ref[:], cB_ref[:]
    mAB, mBA, sh = mAB_ref[:], mBA_ref[:], sh_ref[:]
    packed = digr[0, 0, 0]                    # [L] u32
    idx = (packed & 0xFF).astype(jnp.int32)
    sign = (packed >> 8) & 1
    zero = (packed >> 9) & 1

    L = packed.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1, L), 0)
    msk = (iota == idx[None, None, :])        # [D, 1, L]

    def onehot_row(ref):
        rows = ref[0].astype(jnp.int32)       # [D, 2k, L] (u16 -> i32)
        # exactly one row matches; residues < 2^15 so the i32 sum is exact
        return jnp.where(msk, rows, 0).sum(axis=0).astype(jnp.uint32)

    sx = onehot_row(txr)                      # [2k, L]
    sy = onehot_row(tyr)
    neg_y = rns_sub(jnp.zeros_like(sy), sy, sh[:, 0:1], me)
    sy = jnp.where((sign == 1)[None, :], neg_y, sy)

    X1 = ox[pl.ds(b, 1)][0]                   # [2k, L]
    Y1 = oy[pl.ds(b, 1)][0]
    Z1 = oz[pl.ds(b, 1)][0]
    X3, Y3, Z3 = rns_mixed_add((X1, Y1, Z1), (sx, sy), me, cA, cB,
                               mAB, mBA, sh, k=k)
    keep = (zero == 1)[None, :]
    ox[pl.ds(b, 1)] = jnp.where(keep, X1, X3)[None]
    oy[pl.ds(b, 1)] = jnp.where(keep, Y1, Y3)[None]
    oz[pl.ds(b, 1)] = jnp.where(keep, Z1, Z3)[None]


@functools.cache
def _msm_consts(p: int, k: int):
    """NUMPY only (cached jnp arrays leak tracers across jits)."""
    c = consts_for(p, k)
    spec = c.spec
    one = np.array(spec.to_rns(spec.R % p), dtype=np.uint32)[:, None]
    shifts = np.stack([np.array(spec.to_rns(m * p), dtype=np.uint32)
                       for m in (3, 6, 72)], axis=1)            # [2k, 3]
    return c, one, shifts


@functools.cache
def _build_table_msm(p: int, k: int, PT: int, B: int, TB: int, D: int,
                     L: int, interpret: bool):
    assert B % TB == 0
    BT = B // TB
    kern = functools.partial(_rns_table_msm_kernel, k=k, D=D)
    nr = 2 * k
    tspec = pl.BlockSpec((1, D, nr, L), lambda bt, pt, b: (pt, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 1, 1, L),
                         lambda bt, pt, b: (bt * TB + b, pt, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((TB, nr, L), lambda bt, pt, b: (bt, 0, 0),
                         memory_space=pltpu.VMEM)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bt, pt, b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def call(tx, ty, packed, me, cA, cB, mAB, mBA, onec, sh):
        out_shape = [jax.ShapeDtypeStruct((B, nr, L), jnp.uint32)] * 3
        return pl.pallas_call(
            kern,
            grid=(BT, PT, TB),
            in_specs=[tspec, tspec, dspec, cspec(me.shape), cspec(cA.shape),
                      cspec(cB.shape), cspec(mAB.shape), cspec(mBA.shape),
                      cspec(onec.shape), cspec(sh.shape)],
            out_specs=[ospec] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(tx, ty, packed, me, cA, cB, mAB, mBA, onec, sh)

    return call


def rns_table_msm(spec: RNSSpec, table_u16, packed_digits,
                  TB: int | None = None, interpret: bool = False,
                  mxu: bool = True):
    """Batched fixed-base MSM against a u16 RNS digit table.

    table_u16: (tx, ty) [PT, D, 2k, L] u16 canonical residues of the
    RNS-Montgomery digit multiples (build_rns_table);
    packed_digits: [B, PT, L] u32 (pallas_tablemsm.pack_digits_lanes).
    Returns projective RNS (X, Y, Z) each [B, L, 2k] u32 — per-lane
    partial sums, same contract as rns_msm.rns_table_msm.
    """
    tx, ty = table_u16
    PT, D, nr, L = tx.shape
    k = nr // 2
    B = packed_digits.shape[0]
    assert packed_digits.shape == (B, PT, L)
    if TB is None:
        TB = B if B <= 32 else 32
        while B % TB:
            TB -= 1
    c, onec, shifts = _msm_consts(spec.p, k)
    me, cA, cB, mAB, mBA = c.operands(mxu)
    call = _build_table_msm(spec.p, k, PT, B, TB, D, L, interpret)
    ox, oy, oz = call(tx, ty, packed_digits[:, :, None, :], me, cA, cB,
                      mAB, mBA, jnp.asarray(onec), jnp.asarray(shifts))
    return (jnp.swapaxes(ox, 1, 2), jnp.swapaxes(oy, 1, 2),
            jnp.swapaxes(oz, 1, 2))


def build_rns_table(ops, tx_pos, ty_pos, block_pt: int = 32):
    """Positional Montgomery digit table [PT, D, n, L] -> u16 RNS table
    [PT, D, 2k, L] (canonical residues of value a*M_A mod p + {0..2}p).

    Chunked over PT so the conversion graph's live memory stays bounded;
    the positional source can be freed by the caller afterwards."""
    from .rns_msm import convert_table_to_rns

    @jax.jit
    def to_u16(chunk):                        # [pt, D, L, 2k] u32
        return jnp.moveaxis(chunk, 3, 2).astype(jnp.uint16)

    outs_x, outs_y = [], []
    PT = tx_pos.shape[0]
    for s in range(0, PT, block_pt):
        cx, cy = convert_table_to_rns(ops, tx_pos[s:s + block_pt],
                                      ty_pos[s:s + block_pt],
                                      block_pt=block_pt)
        outs_x.append(to_u16(cx))
        outs_y.append(to_u16(cy))
    return jnp.concatenate(outs_x), jnp.concatenate(outs_y)
