"""Fixed-base precomputed-table MSM kernels.

The hot MSMs of both prover paths have FIXED bases — the Lagrange commit
key (reference: internal/kzg/srs.go:56) and FK20's FFT'd SRS vectors
(reference: internal/kzg_multi/fk20/toeplitz.go:50-114) — a fact gnark's
generic Pippenger cannot exploit but a TPU-first design can.  For every
(base point, window) pair we precompute all signed-digit multiples

    T[p, d] = d * 2^(wbits*w) * P_i          d in [1, 2^(wbits-1)]

so an MSM becomes a pure stream of complete mixed adds of table entries
selected by the scalars' signed digits:

* NO bucket state, NO Horner doublings, NO weighted bucket reduction;
* the table streams through VMEM ONCE per batch (grid: pair-tile outer,
  batch inner) — amortised over the whole batch;
* accumulators (one projective point per (batch row, lane)) live in VMEM
  for the entire kernel as a constant-index output block;
* the group law is the complete RCB projective mixed add (11 muls,
  ops/pallas_proj.py): one code path, accumulator starts at (0:1:0);
* digit selection is a one-hot masked sum over the tile's D digit rows.

Two digit layouts share the kernel (they only differ in how the caller
packs digits and reduces lanes):

* commit (wbits=8, D=128): pairs p = w*N + i spread over all lanes; the
  caller tree-adds the 128 lane partial sums per blob;
* FK20 Toeplitz (wbits=4, D=8): lane = output frequency, step = (point,
  window); each lane accumulates one output — no reduction at all.

Digit convention matches ops/pallas_msm.signed_digits: signed windows,
|d| <= 2^(wbits-1), unsigned top window, zero digits skipped by keeping
the old accumulator.  Scalars must be < 2^255.
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

L = 128           # lanes per tile


def _table_msm_kernel(txr, tyr, digr, modr, npr, oner, ox, oy, oz,
                      *, n, D):
    """Grid (BT, PT, TB): batch-tile outer, pair-tile middle, row inner.

    For a fixed batch tile bt the accumulator block ox/oy/oz [TB, n, L]
    stays VMEM-resident across every (pt, tb) step (its index map ignores
    pt/tb); the table tile txr/tyr [1, D, n, L] is fetched once per
    (bt, pt) and reused for the TB rows.  VMEM budget = 3 * TB * n * L
    words of accumulator + the double-buffered 2 * D * n * L tile.

    digr: [1, 1, 1, L] packed digits for (row, tile): idx|sign<<8|zero<<9
    (the singleton 3rd axis keeps the block's trailing dims (1, L) legal
    for Mosaic: each must divide (8, 128) or equal the array dim).
    """
    pt = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when((pt == 0) & (b == 0))
    def _():
        ox[...] = jnp.zeros_like(ox)
        oy[...] = jnp.broadcast_to(oner[:], oy.shape)  # (0 : 1 : 0)
        oz[...] = jnp.zeros_like(oz)

    modc, npc = modr[:], npr[:]
    packed = digr[0, 0, 0]                    # [L] u32
    idx = (packed & 0xFF).astype(jnp.int32)
    sign = (packed >> 8) & 1
    zero = (packed >> 9) & 1

    # one-hot select the digit row per lane: T[idx[l], :, l]
    iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1, L), 0)
    m = (iota == idx[None, None, :])          # [D, 1, L]

    def onehot_row(ref):
        rows = ref[0]                         # [D, n, L]
        masked = jnp.where(m, rows, jnp.zeros((), dtype=rows.dtype))
        # exactly one row matches; limbs < 2^16 so the i32 sum is exact
        return masked.astype(jnp.int32).sum(axis=0).astype(jnp.uint32)

    sx = onehot_row(txr)                      # [n, L]
    sy = onehot_row(tyr)
    # signed digit: negate y (table points are never infinity, y != 0)
    neg_y = _mod_sub_lm(jnp.broadcast_to(modc, sy.shape), sy, modc)
    sy = _sel(sign, neg_y, sy)

    X1 = ox[pl.ds(b, 1)][0]                   # [n, L]
    Y1 = oy[pl.ds(b, 1)][0]
    Z1 = oz[pl.ds(b, 1)][0]
    X3, Y3, Z3 = proj_add_mixed_lm(X1, Y1, Z1, sx, sy, modc, npc, n)
    # zero digit: keep the old accumulator
    X3 = _sel(zero, X1, X3)
    Y3 = _sel(zero, Y1, Y3)
    Z3 = _sel(zero, Z1, Z3)
    ox[pl.ds(b, 1)] = X3[None]
    oy[pl.ds(b, 1)] = Y3[None]
    oz[pl.ds(b, 1)] = Z3[None]


@functools.cache
def _consts(n: int, modulus: int, n_prime: int, one_mont: int):
    enc = lambda v: np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)],
                             dtype=np.uint32).reshape(n, 1)
    return enc(modulus), enc(n_prime), enc(one_mont)


@functools.cache
def _build(n: int, modulus: int, n_prime: int, one_mont: int,
           PT: int, B: int, TB: int, D: int, interpret: bool):
    assert B % TB == 0
    BT = B // TB
    kern = functools.partial(_table_msm_kernel, n=n, D=D)
    tspec = pl.BlockSpec((1, D, n, L), lambda bt, pt, b: (pt, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 1, 1, L),
                         lambda bt, pt, b: (bt * TB + b, pt, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((n, 1), lambda bt, pt, b: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((TB, n, L), lambda bt, pt, b: (bt, 0, 0),
                         memory_space=pltpu.VMEM)

    def call(tx, ty, packed, modc, npc, onec):
        out_shape = [jax.ShapeDtypeStruct((B, n, L), jnp.uint32)] * 3
        return pl.pallas_call(
            kern,
            grid=(BT, PT, TB),
            in_specs=[tspec, tspec, dspec, cspec, cspec, cspec],
            out_specs=[ospec] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(tx, ty, packed, modc, npc, onec)

    return call


def pack_bits(idx, sign, zero):
    return (idx.astype(jnp.uint32)
            | (sign.astype(jnp.uint32) << 8)
            | (zero.astype(jnp.uint32) << 9))


def pack_digits_lanes(scalars_normal, wbits: int = 8):
    """Commit layout: [B, N, 16] scalars -> [B, PT, L], pair p = w*N + i."""
    B, N = scalars_normal.shape[:2]
    nw = 256 // wbits
    packed = pack_bits(*signed_digits(scalars_normal, wbits))   # [B, N, W]
    packed = jnp.swapaxes(packed, 1, 2).reshape(B, N * nw)      # w-major
    return packed.reshape(B, (N * nw) // L, L)


def pack_digits_outputs(scalars_normal, wbits: int = 4):
    """FK20 layout: [B, L outputs, V points] scalars -> [B, V*W, L]:
    tile pt = v*W + w holds, in lane k, digit w of scalar [k, v]."""
    B, K, V = scalars_normal.shape[:3]
    assert K == L
    nw = 256 // wbits
    packed = pack_bits(*signed_digits(scalars_normal, wbits))   # [B,K,V,W]
    packed = packed.transpose(0, 2, 3, 1)                       # [B,V,W,K]
    return packed.reshape(B, V * nw, L)


def table_msm(spec, table, packed_digits, interpret: bool = False,
              TB: int | None = None):
    """Batched fixed-base MSM against a precomputed digit table.

    table: (tx, ty) [PT, D, n, L]; packed_digits: [B, PT, L] (see the
    pack_digits_* helpers).  Returns projective (X, Y, Z) each [B, L, n]:
    per-lane partial sums — the commit layout tree-adds lanes, the output
    layout reads lane k as output k.

    TB: accumulator rows kept VMEM-resident per batch tile (3*TB*n*L words
    + the double-buffered tile must fit the ~16 MB VMEM); batch rows
    beyond TB re-stream the table once per extra tile.
    """
    tx, ty = table
    PT, D, n, _ = tx.shape
    B = packed_digits.shape[0]
    assert packed_digits.shape == (B, PT, L)
    if TB is None:
        TB = B if B <= 32 else 32
        while B % TB:
            TB -= 1
    modc, npc, onec = _consts(n, spec.modulus, spec.n_prime, spec.R_mod)
    call = _build(n, spec.modulus, spec.n_prime, spec.R_mod, PT, B, TB, D,
                  interpret)
    ox, oy, oz = call(tx, ty, packed_digits[:, :, None, :], modc, npc, onec)
    return (jnp.swapaxes(ox, 1, 2), jnp.swapaxes(oy, 1, 2),
            jnp.swapaxes(oz, 1, 2))


# ---------------------------------------------------------------------------
# table construction (one-time per setup, disk-cached by the caller)
# ---------------------------------------------------------------------------


def build_table_device(curve, points_affine, wbits: int = 8,
                       windows_per_slice: int = 4, pair_order: str = "wN"):
    """Full table as DEVICE jnp arrays (tx, ty) [PT, D, n, L].

    Unlike assemble_table, slices never round-trip to the host — on the
    axon setup the device is remote and a 3.2 GB transfer through the
    tunnel costs far more than the on-device generation (~2 s of complete
    adds whose graphs ride the persistent compile cache).
    """
    import jax as _jax

    F = curve.F
    n = F.n
    W = 256 // wbits
    D = 1 << (wbits - 1)
    N = points_affine[0].shape[0]
    wps = windows_per_slice
    # each slice must retile to whole [*, D, n, L] tiles: wps*N % L == 0
    while (wps * N) % L or W % wps:
        wps += 1
    V = N // L

    @_jax.jit
    def retile(ax, ay):
        """[D, wps, N, n] multiples -> [rows, D, n, L] tiles (pair_order)."""
        def tile(a):
            if pair_order == "wN":
                a = jnp.moveaxis(a, 0, 2)            # [wps, N, D, n]
                a = a.reshape(wps * N // L, L, D, n)
                return jnp.moveaxis(a, 1, 3)         # [tiles, D, n, L]
            a = a.reshape(D, wps, V, L, n)
            a = a.transpose(2, 1, 0, 4, 3)           # [V, wps, D, n, L]
            return a.reshape(V * wps, D, n, L)

        return tile(ax), tile(ay)

    txs, tys = [], []
    for s, ax, ay in _device_table_slices(curve, points_affine, wbits, wps):
        tx, ty = retile(ax, ay)
        txs.append(tx)
        tys.append(ty)
    tx = jnp.concatenate(txs, axis=0)
    ty = jnp.concatenate(tys, axis=0)
    if pair_order == "vW":
        # slice s holds tiles (v, w) for w in [s*wps, (s+1)*wps), laid out
        # [V, wps] — scatter to global tile pt = v*W + w
        perm = np.zeros((W // wps) * V * wps, dtype=np.int64)
        row = 0
        for s in range(W // wps):
            for v in range(V):
                for j in range(wps):
                    perm[v * W + s * wps + j] = row
                    row += 1
        tx = jnp.take(tx, jnp.asarray(perm), axis=0)
        ty = jnp.take(ty, jnp.asarray(perm), axis=0)
    return tx, ty


def _device_table_slices(curve, points_affine, wbits, wps):
    """Yields (s, ax, ay) device arrays [D, wps, N, n] per window slice."""
    import jax as _jax

    F = curve.F
    n = F.n
    W = 256 // wbits
    D = 1 << (wbits - 1)
    px, py, pinf = points_affine
    N = px.shape[0]

    @_jax.jit
    def shift_windows(x, y):
        jac = curve.from_affine(x, y, jnp.zeros((N,), dtype=bool))
        bases = []
        for _ in range(wps):
            bases.append(jac)
            for _ in range(wbits):
                jac = curve.double(jac)
        return (jnp.stack([b[0] for b in bases]),
                jnp.stack([b[1] for b in bases]),
                jnp.stack([b[2] for b in bases])), jac

    @_jax.jit
    def digit_multiples(bx, by, bz):
        base = (bx, by, bz)

        def body(acc, _):
            nxt = curve.add(acc, base)
            return nxt, nxt

        _, rest = _jax.lax.scan(body, base, None, length=D - 1)
        mx = jnp.concatenate([bx[None], rest[0]])
        my = jnp.concatenate([by[None], rest[1]])
        mz = jnp.concatenate([bz[None], rest[2]])
        zinv = F.batch_inv(mz.reshape(-1, n)).reshape(mz.shape)
        zi2 = F.mul(zinv, zinv)
        return F.mul(mx, zi2), F.mul(my, F.mul(zi2, zinv))

    @_jax.jit
    def to_affine_carry(cx, cy, cz):
        zinv = F.batch_inv(cz)
        zi2 = F.mul(zinv, zinv)
        return F.mul(cx, zi2), F.mul(cy, F.mul(zi2, zinv))

    cur_x, cur_y = jnp.asarray(px), jnp.asarray(py)
    for s in range(W // wps):
        (bx, by, bz), carry = shift_windows(cur_x, cur_y)
        ax, ay = digit_multiples(bx, by, bz)
        yield s, ax, ay
        if s + 1 < W // wps:
            cur_x, cur_y = to_affine_carry(*carry)
