"""Fused Pallas bucket-accumulation kernel for the MSM (the #1 hot loop).

Everything the Pippenger bucket phase needs lives in VMEM for the whole
point stream: the signed-digit bucket state ([128 buckets, 72 limb-coords,
128 lanes] ≈ 4.7 MB scratch), the complete mixed-addition group law, and a
one-hot masked gather/merge instead of scatter (TPU scatters serialize).
Points and digits stream in through the grid's block pipeline, so HBM
traffic is one pass over the inputs plus one bucket-state writeback per
grid cell — versus one full state read+write per point step for the
XLA-scan formulation.

Digit convention (signed window, w = 8):
  scalar = sum_w d_w 2^(8w),  d_w in [-128, 127] after borrow recoding;
  bucket index = |d_w| - 1 in [0, 127]; d_w = 0 adds nothing; the sign
  flips the point's y.  The weighted reduction is sum_d (d+1) * B_d.

Lane layout: L = C_IN * W lanes per grid cell — C_IN point chunks each
feeding all W=32 windows, so the group law runs (24, 128)-wide.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import _conv, _ks_carry, _propagate
from .pallas_curve import (_cond_sub_mod, _double_lm, _is_zero_lm,
                           _mod_add_lm, _mod_sub_lm, _mont_mul_lm, _sel)

W = 32            # windows (256-bit scalars / 8-bit windows)
WBITS = 8
D = 128           # signed buckets: |digit| in [1, 128] -> index 0..127
C_IN = 4          # point chunks per grid cell (lanes = C_IN * W = 128)
L = C_IN * W


def signed_digits(scalars_normal, wbits: int = WBITS):
    """[..., 16] normal limbs -> (idx, sign, zero) each [..., 256/wbits].

    Signed window recoding: d'_w = d_w - 2^wbits * (d_w >= 2^(wbits-1)),
    carry into w+1; idx = |d'| - 1 (0 when d' == 0 — masked by `zero`),
    sign = 1 if d' < 0.  PRECONDITION: scalars < 2^255.  The top window is
    NOT recoded (kept unsigned, value <= 2^(wbits-1)-1 + carry
    = 2^(wbits-1)), so the final borrow carry can never be dropped;
    scalars >= 2^255 would need an extra window.  wbits must divide 16.
    """
    assert 16 % wbits == 0
    nw = 256 // wbits
    half = 1 << (wbits - 1)
    per_limb = 16 // wbits
    shifts = np.arange(per_limb, dtype=np.uint32) * np.uint32(wbits)
    d = ((scalars_normal[..., None] >> shifts) & np.uint32((1 << wbits) - 1))
    d = d.reshape(scalars_normal.shape[:-1] + (nw,)).astype(jnp.int32)
    outs = []
    carry = jnp.zeros(d.shape[:-1], dtype=jnp.int32)
    for w in range(nw):
        cur = d[..., w] + carry
        if w == nw - 1:
            outs.append(cur)        # unsigned top window, in [0, 2^(wbits-1)]
            break
        ge = (cur >= half).astype(jnp.int32)
        outs.append(cur - 2 * half * ge)
        carry = ge
    ds = jnp.stack(outs, axis=-1)                # [..., nw], |d| <= half
    sign = (ds < 0).astype(jnp.int32)
    mag = jnp.abs(ds)
    zero = (mag == 0).astype(jnp.int32)
    idx = jnp.maximum(mag - 1, 0)
    return idx, sign, zero


def _bucket_kernel(pxr, pyr, pinfr, idxr, signr, zeror, modr, npr, oner,
                   obx, oby, obz, *, n, steps):
    """Grid (B, GC, S); the out blocks ([D, n, L], block index constant in
    t) double as the VMEM-resident bucket state across the point stream.

    pxr/pyr: [1, 1, n, C_IN] (chunk points, broadcast over windows
    in-kernel); pinfr: [1, 1, 1, C_IN]; idx/sign/zero: [1, 1, 1, L].
    """
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        obx[0, 0] = jnp.zeros((D, n, L), dtype=jnp.uint32)
        oby[0, 0] = jnp.zeros((D, n, L), dtype=jnp.uint32)
        obz[0, 0] = jnp.zeros((D, n, L), dtype=jnp.uint32)

    BX, BY, BZ = obx[0, 0], oby[0, 0], obz[0, 0]    # [D, n, L] bucket state
    modc, npc, onec = modr[:], npr[:], oner[:]

    def widen(v):                                   # [m, C_IN] -> [m, L]
        # lane layout is W-major (lane = w*C_IN + ci), so widening a
        # per-chunk vector is a plain tile-concat (Mosaic-friendly)
        return jnp.concatenate([v] * W, axis=1)

    x2 = widen(pxr[0, 0])                           # [n, L]
    y2 = widen(pyr[0, 0])
    pinf = widen(pinfr[0, 0])[0]                    # [L] u32
    idx = idxr[0, 0, 0]
    sign = signr[0, 0, 0]
    zero = zeror[0, 0, 0]

    # signed digit: negate y when sign == 1 (mirror FieldSpec.neg: 0 -> 0)
    y_zero = _is_zero_lm(y2)
    neg_y = _mod_sub_lm(jnp.broadcast_to(modc, y2.shape), y2, modc)
    neg_y = _sel(y_zero, y2, neg_y)
    y2 = _sel((sign == 1).astype(jnp.uint32), neg_y, y2)
    skip = pinf.astype(jnp.uint32) | (zero == 1).astype(jnp.uint32)  # [L]

    # one-hot gather of the target bucket rows
    iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1, L), 0)
    m = (iota == idx[None, None, :])                 # [D, 1, L]
    # one-hot row extraction (signed i32 sum: Mosaic lacks u32 reductions;
    # exactly one row matches and limbs are < 2^16, so i32 is exact)
    def onehot_row(b):
        masked = jnp.where(m, b, jnp.zeros((), dtype=b.dtype))
        return masked.astype(jnp.int32).sum(axis=0).astype(jnp.uint32)

    X1 = onehot_row(BX)
    Y1 = onehot_row(BY)
    Z1 = onehot_row(BZ)

    # complete mixed addition (mirrors pallas_curve._add_affine_kernel)
    mul = lambda u, v: _mont_mul_lm(u, v, modc, npc, n)
    add = lambda u, v: _mod_add_lm(u, v, modc)
    sub = lambda u, v: _mod_sub_lm(u, v, modc)
    inf1 = _is_zero_lm(Z1)
    Z1Z1 = mul(Z1, Z1)
    U2 = mul(x2, Z1Z1)
    S2 = mul(mul(y2, Z1), Z1Z1)
    H = sub(U2, X1)
    rr = sub(S2, Y1)
    rr = add(rr, rr)
    x_eq = _is_zero_lm(H)
    y_eq = _is_zero_lm(rr)
    H2 = add(H, H)
    I = mul(H2, H2)
    J = mul(H, I)
    V = mul(X1, I)
    X3 = sub(sub(mul(rr, rr), J), add(V, V))
    SJ = mul(Y1, J)
    Y3 = sub(mul(rr, sub(V, X3)), add(SJ, SJ))
    Z3 = mul(Z1, H2)
    dX, dY, dZ = _double_lm(X1, Y1, Z1, modc, npc, n)
    is_double = x_eq * y_eq * (1 - inf1)
    X3 = _sel(is_double, dX, X3)
    Y3 = _sel(is_double, dY, Y3)
    Z3 = _sel(is_double, dZ, Z3)
    # bucket at infinity -> promote the incoming affine point (Z = 1)
    one_b = jnp.broadcast_to(onec, Z3.shape)
    X3 = _sel(inf1, x2, X3)
    Y3 = _sel(inf1, y2, Y3)
    Z3 = _sel(inf1, one_b, Z3)

    # skip-masked merge back into the bucket planes
    keep_mask = m & (skip[None, None, :] == 0)        # [D, 1, L]
    obx[0, 0] = jnp.where(keep_mask,
                          jnp.broadcast_to(X3[None], BX.shape), BX)
    oby[0, 0] = jnp.where(keep_mask,
                          jnp.broadcast_to(Y3[None], BY.shape), BY)
    obz[0, 0] = jnp.where(keep_mask,
                          jnp.broadcast_to(Z3[None], BZ.shape), BZ)


@functools.cache
def _consts(n: int, modulus: int, n_prime: int, r_mod: int):
    enc = lambda v: np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                             dtype=np.uint32).reshape(n, 1)
    return enc(modulus), enc(n_prime), enc(r_mod)


@functools.cache
def _build(n: int, modulus: int, n_prime: int, r_mod: int,
           B: int, GC: int, S: int):
    kern = functools.partial(_bucket_kernel, n=n, steps=S)
    pt = pl.BlockSpec((1, 1, n, C_IN), lambda b, gc, t: (gc, t, 0, 0),
                      memory_space=pltpu.VMEM)
    pi = pl.BlockSpec((1, 1, 1, C_IN), lambda b, gc, t: (gc, t, 0, 0),
                      memory_space=pltpu.VMEM)
    dg = pl.BlockSpec((1, 1, 1, L), lambda b, gc, t: (b * GC + gc, t, 0, 0),
                      memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((n, 1), lambda b, gc, t: (0, 0),
                       memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((1, 1, D, n, L), lambda b, gc, t: (b, gc, 0, 0, 0),
                      memory_space=pltpu.VMEM)

    def call(pxc, pyc, pinfc, idx, sign, zero, modc, npc, onec):
        out_shape = [jax.ShapeDtypeStruct((B, GC, D, n, L), jnp.uint32)] * 3
        return pl.pallas_call(
            kern,
            grid=(B, GC, S),
            in_specs=[pt, pt, pi, dg, dg, dg, cst, cst, cst],
            out_specs=[ob, ob, ob],
            out_shape=out_shape,
        )(pxc, pyc, pinfc, idx, sign, zero, modc, npc, onec)

    return call


def bucket_phase(spec, points_affine, scalars_normal, one_mont_int: int):
    """Signed-digit Pippenger bucket phase, fully fused in Pallas.

    points_affine: (px [N, n], py [N, n], pinf [N]) SHARED across the batch.
    scalars_normal: [B, N, 16].
    Returns bucket tuple [B, GC*C_IN, W, D, n(/-)] (+ inf handled via Z=0)
    ready for the chunk tree-merge, in the same convention as
    msm._bucket_scan output.
    """
    n = spec.n
    px, py, pinf = points_affine
    B, N = scalars_normal.shape[:2]
    assert N % (C_IN * 128) == 0 or N % (C_IN * 64) == 0
    S = N // C_IN
    GC = 1
    # Longer point streams per grid cell => fewer chunks to tree-merge in
    # the XLA tail (the merge is (GC*C_IN-1)*W*D complete adds per blob);
    # measured: s_cap 2048 beats 512 by ~12% end-to-end at N=4096.
    while S > 2048:
        S //= 2
        GC *= 2
    # chunk layout: point j = ((gc*C_IN + ci)*S + t)
    pxc = px.reshape(GC, C_IN, S, n).transpose(0, 2, 3, 1)      # [GC,S,n,C_IN]
    pyc = py.reshape(GC, C_IN, S, n).transpose(0, 2, 3, 1)
    pinfc = pinf.astype(jnp.uint32).reshape(GC, C_IN, S, 1).transpose(
        0, 2, 3, 1)                                             # [GC,S,1,C_IN]

    idx, sign, zero = signed_digits(scalars_normal)             # [B, N, W]

    def lane_layout(a):
        # W-major lanes: lane = w*C_IN + ci (matches the kernel's widen)
        a = a.reshape(B, GC, C_IN, S, W).transpose(0, 1, 3, 4, 2)
        return a.reshape(B * GC, S, 1, L)

    modc, npc, onec = _consts(n, spec.modulus, spec.n_prime, one_mont_int)
    call = _build(n, spec.modulus, spec.n_prime, one_mont_int, B, GC, S)
    obx, oby, obz = call(pxc, pyc, pinfc, lane_layout(idx),
                         lane_layout(sign), lane_layout(zero),
                         modc, npc, onec)
    # [B, GC, D, n, L] -> [B, GC*C_IN, W, D, n]
    def unpack(o):
        o = o.reshape(B, GC, D, n, W, C_IN)
        return o.transpose(0, 1, 5, 4, 2, 3).reshape(B, GC * C_IN, W, D, n)

    return unpack(obx), unpack(oby), unpack(obz)
