"""Multi-scalar multiplication (Pippenger) for TPU.

The TPU-native analog of gnark's Pippenger MultiExp (reference:
internal/multiexp/multiexp.go:20-34).  Branch-free formulation shaped for
a vector machine:

* window digits are extracted vectorized from 16-bit limbs;
* the batch, chunk, and window axes are EXPLICIT array dimensions (not
  vmap) so the field layer sees the full lane width and dispatches to the
  VMEM-resident Pallas multiply — under vmap each instance would look
  32-lanes wide and fall back to the HBM-bound jnp path;
* the point axis is split into chunks that bucket-accumulate in parallel
  (one `lax.scan` whose body does a [B, C, W]-wide complete mixed
  addition), then chunk bucket arrays merge with a log-depth tree;
* the weighted bucket reduction sum_d d*B_d runs as a two-accumulator
  bucket-walk `lax.scan` (one 2-add body compiled once);
* windows are combined with a Horner chain of doublings (the only
  inherently sequential part).
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import proj


def _pvary(tree, vary_axes):
    """Mark scan-carry inits as varying over shard_map axes (no-op outside)."""
    if not vary_axes:
        return tree
    return jax.tree.map(lambda c: jax.lax.pvary(c, vary_axes), tree)


def fr_digits(scalars_normal, window: int):
    """[..., 16] normal-form Fr limbs -> [..., 256/window] uint32 digits.

    window must divide 16 (digits never straddle a limb boundary).
    """
    assert 16 % window == 0
    per_limb = 16 // window
    shifts = np.arange(per_limb, dtype=np.uint32) * np.uint32(window)
    mask = np.uint32((1 << window) - 1)
    d = (scalars_normal[..., None] >> shifts) & mask
    return d.reshape(scalars_normal.shape[:-1] + (-1,))


def _tree_add(curve, pts, axis_from_end: int):
    """Log-depth pairwise reduction of a point-tuple along one batch axis.

    axis_from_end counts batch axes from the right (0 = last batch axis).
    Odd sizes are padded with the point at infinity (Z = 0).
    """
    td = curve.F.trailing_dims

    def ax(c):
        return c.ndim - td - 1 - axis_from_end

    while pts[0].shape[ax(pts[0])] > 1:
        m = pts[0].shape[ax(pts[0])]
        if m % 2 == 1:
            def pad(c):
                a = ax(c)
                pad_shape = c.shape[:a] + (1,) + c.shape[a + 1:]
                return jnp.concatenate(
                    [c, jnp.zeros(pad_shape, dtype=c.dtype)], axis=a)
            pts = tuple(pad(c) for c in pts)

        def half(c, start):
            sl = [slice(None)] * c.ndim
            sl[ax(c)] = slice(start, None, 2)
            return c[tuple(sl)]

        lo = tuple(half(c, 0) for c in pts)
        hi = tuple(half(c, 1) for c in pts)
        pts = curve.add(lo, hi)
    sq = []
    for c in pts:
        sl = [slice(None)] * c.ndim
        sl[ax(c)] = 0
        sq.append(c[tuple(sl)])
    return tuple(sq)


def _weighted_bucket_sum(curve, buckets, vary_axes=(), drop_zero=True):
    """Weighted bucket reduction via the classic two-accumulator walk:
    running += B_d (d high -> low), total += running, as a `lax.scan`.

    drop_zero=True: S_w = sum_{d=1}^{D-1} d * B_{w,d} (unsigned digits:
    index IS the weight, bucket 0 contributes nothing — it is sliced off
    before the walk).
    drop_zero=False: S_w = sum_{d=0}^{D-1} (d+1) * B_{w,d} (signed-digit
    layout where index i holds |digit| = i+1).

    The scan compiles ONE 2-add body instead of the log2(D) shifted adds +
    log-depth tree of the suffix-sum formulation (16 distinct point-add
    instantiations at window=8) — minutes of XLA compile per module — and
    does ~8x fewer lane-ops at production widths, where the [batch, W]
    lanes already saturate the VPU (measured ~16% better end-to-end).

    buckets: tuple of [*, D, *e].  Returns a tuple of [*, *e].
    """
    td = curve.F.trailing_dims

    def ax(c):
        return c.ndim - td - 1

    if drop_zero:
        def drop0(c):
            sl = [slice(None)] * c.ndim
            sl[ax(c)] = slice(1, None)
            return c[tuple(sl)]

        buckets = tuple(drop0(c) for c in buckets)

    bshape = buckets[0].shape[:ax(buckets[0])]
    inf = curve.infinity(bshape)
    init = (_pvary(inf, vary_axes), _pvary(inf, vary_axes))
    xs = tuple(jnp.moveaxis(c, ax(c), 0)[::-1] for c in buckets)

    def body(carry, bd):
        running, total = carry
        running = curve.add(running, bd)
        total = curve.add(total, running)
        return (running, total), None

    (_, total), _ = jax.lax.scan(body, init, xs)
    return total


def _auto_chunks(n: int) -> int:
    c = 1
    while c < 8 and n % (2 * c) == 0 and n // (2 * c) >= 64:
        c *= 2
    return c


def _bucket_scan(curve, px, py, pinf, digits, num_buckets, vary_axes=()):
    """Bucket accumulation over explicit [B, C] axes.

    px/py: [B, C, S, *e]; pinf: [B, C, S]; digits: [B, C, S, W].
    Scans over S; each step is a [B, C, W]-wide complete mixed addition.
    Returns bucket tuple [B, C, W, num_buckets, *e].
    """
    td = curve.F.trailing_dims
    B, C, S, W = digits.shape

    bshape = (B, C, W, num_buckets)
    buckets = _pvary(curve.infinity(bshape), vary_axes)

    # scan over the point axis: move S to the front of every xs leaf
    xs = (jnp.moveaxis(px, 2, 0), jnp.moveaxis(py, 2, 0),
          jnp.moveaxis(pinf, 2, 0), jnp.moveaxis(digits, 2, 0))

    iota_d = np.arange(num_buckets, dtype=np.uint32)

    def body(buckets, inp):
        # One-hot masked gather/merge instead of gather/scatter: TPU XLA
        # lowers scatters (and batched take/put_along_axis) to serialized
        # row updates (~20 ms/step measured); the dense select streams the
        # bucket state at full HBM bandwidth instead.
        x, y, inf, d = inp                      # x: [B, C, *e]; d: [B, C, W]
        onehot = (d[..., None] == iota_d)       # [B, C, W, D] bool

        def gather(b):
            m = onehot.reshape(onehot.shape + (1,) * (b.ndim - onehot.ndim))
            masked = jnp.where(m, b, jnp.zeros((), dtype=b.dtype))
            return masked.sum(axis=3, dtype=b.dtype)

        cur = tuple(gather(b) for b in buckets)  # [B, C, W, *e]
        ex = jnp.broadcast_to(x[:, :, None], cur[0].shape)
        ey = jnp.broadcast_to(y[:, :, None], cur[1].shape)
        einf = jnp.broadcast_to(inf[:, :, None], (B, C, W))
        new = curve.add_affine(cur, (ex, ey), a2_inf=einf)

        def merge(b, v):
            m = onehot.reshape(onehot.shape + (1,) * (b.ndim - onehot.ndim))
            return jnp.where(m, jnp.expand_dims(v, 3), b)

        buckets = tuple(merge(b, v) for b, v in zip(buckets, new))
        return buckets, None

    buckets, _ = jax.lax.scan(body, buckets, xs)
    return buckets


def msm_core(curve, points_affine, scalars_normal, window: int = 8,
             vary_axes=(), chunks: int | None = None,
             shared_points: bool = False):
    """Batched MSM: [B] independent MSMs of size N, explicit batch axes.

    points_affine: (x, y, inf) with shape [B, N, *e] / [B, N]; or, with
    shared_points=True, unbatched [N, *e] arrays shared across the batch.
    scalars_normal: [B, N, 16].  Returns a Jacobian tuple with batch [B].
    """
    td = curve.F.trailing_dims
    N_ = scalars_normal.shape[1]
    if (shared_points and window == 8 and td == 1 and N_ % 512 == 0
            and not vary_axes):
        from .field import _pallas_enabled
        if _pallas_enabled():
            # fused signed-digit bucket kernel (buckets stay in VMEM)
            from . import pallas_msm
            buckets = pallas_msm.bucket_phase(
                curve.F, points_affine, scalars_normal, curve.F.R_mod)
            merged = _tree_add(curve, buckets, axis_from_end=2)
            window_sums = _weighted_bucket_sum(curve, merged,
                                               drop_zero=False)
            return combine_window_sums(curve, window_sums, window)
    if shared_points:
        B_ = scalars_normal.shape[0]
        points_affine = tuple(
            jnp.broadcast_to(c[None], (B_,) + c.shape) for c in points_affine)
    px, py, pinf = points_affine
    B, N = scalars_normal.shape[:2]
    c = _auto_chunks(N) if chunks is None else chunks
    S = N // c
    num_buckets = 1 << window

    digits = fr_digits(scalars_normal, window)          # [B, N, W]
    W = digits.shape[-1]

    def split(a, extra_dims):
        return a.reshape((B, c, S) + a.shape[2:])

    buckets = _bucket_scan(
        curve,
        split(px, td), split(py, td), split(pinf, 0),
        digits.reshape(B, c, S, W),
        num_buckets, vary_axes)

    # merge chunks: [B, C, W, D, *e] -> [B, W, D, *e]
    merged = _tree_add(curve, buckets, axis_from_end=2)
    # weighted bucket reduction -> window sums [B, W, *e]
    window_sums = _weighted_bucket_sum(curve, merged, vary_axes)
    return combine_window_sums(curve, window_sums, window, vary_axes)


def msm(curve, points_affine, scalars_normal, window: int = 8,
        vary_axes=(), chunks: int | None = None):
    """Single MSM: sum_i scalars[i] * P_i (Pippenger).

    points_affine: (x [N, *e], y [N, *e], inf [N]) in Montgomery form.
    scalars_normal: [N, 16] uint32 limbs, canonical (non-Montgomery).
    Returns an unbatched Jacobian point.
    """
    pts = tuple(c[None] for c in points_affine)
    res = msm_core(curve, pts, scalars_normal[None], window, vary_axes,
                   chunks)
    return tuple(c[0] for c in res)


def msm_batched(curve, points_affine, scalars_normal, shared_points: bool,
                window: int = 8, chunks: int | None = None):
    """[B] MSMs; points either shared or per-instance [B, N]."""
    return msm_core(curve, points_affine, scalars_normal, window,
                    chunks=chunks, shared_points=shared_points)


def msm_window_sums(curve, points_affine, scalars_normal, window: int = 8,
                    vary_axes=(), chunks: int | None = None):
    """Pippenger bucket phase only: per-window sums S_w (lane axis W).

    Used by the point-sharded multi-chip MSM (parallel/) which all-gathers
    partial window sums across devices before the Horner combine.
    """
    td = curve.F.trailing_dims
    px, py, pinf = points_affine
    N = scalars_normal.shape[0]
    c = _auto_chunks(N) if chunks is None else chunks
    S = N // c
    num_buckets = 1 << window
    digits = fr_digits(scalars_normal, window)
    W = digits.shape[-1]

    buckets = _bucket_scan(
        curve,
        px.reshape((1, c, S) + px.shape[1:]),
        py.reshape((1, c, S) + py.shape[1:]),
        pinf.reshape(1, c, S),
        digits.reshape(1, c, S, W),
        num_buckets, vary_axes)
    merged = _tree_add(curve, buckets, axis_from_end=2)
    ws = _weighted_bucket_sum(curve, merged, vary_axes)
    return tuple(x[0] for x in ws)                      # [W, *e]


def combine_window_sums(curve, window_sums, window: int = 8, vary_axes=()):
    """Horner combine over the last batch axis (windows), MSB first."""
    td = curve.F.trailing_dims

    def wfirst(c):
        return jnp.moveaxis(c, c.ndim - td - 1, 0)[::-1]

    ws_msb_first = tuple(wfirst(c) for c in window_sums)
    batch = ws_msb_first[0].shape[1:-td] if td else ws_msb_first[0].shape[1:]

    def horner_body(acc, s_w):
        for _ in range(window):
            acc = curve.double(acc)
        return curve.add(acc, s_w), None

    init = _pvary(curve.infinity(tuple(batch)), vary_axes)
    result, _ = jax.lax.scan(horner_body, init, ws_msb_first)
    return result


def msm_fixed_base(curve, table, scalars_normal, interpret: bool = False,
                   wbits: int = 4):
    """Batched MSM against a precomputed fixed-base digit table.

    table: (tx, ty) [PT, D, n, L] from pallas_tablemsm.build_table_device;
    scalars_normal: [B, N, 16].  Returns a Jacobian tuple [B].

    The kernel emits one projective partial sum per (blob, lane); the tail
    tree-adds the 128 lanes (7 levels of complete projective adds) — no
    Horner doublings, no bucket reduction.  wbits=4 keeps the one-hot
    digit select at 8 rows (the D-row stream is what bounded the round-1
    bucket kernel) at the price of 2x the mixed adds — the measured
    optimum for the commit path.
    """
    from . import pallas_tablemsm
    spec = curve.F
    packed = pallas_tablemsm.pack_digits_lanes(scalars_normal, wbits=wbits)
    res = pallas_tablemsm.table_msm(spec, table, packed, interpret)
    x, y, z = proj.tree_add(spec, res, axis_from_end=0)       # [B] proj
    return proj.to_jacobian(spec, (x, y, z))


def _proj_weighted_sum(spec, buckets):
    """S = sum_d (d+1) * B_d over the D axis (signed-digit layout), via the
    suffix-sum identity, in complete projective coordinates.

    buckets: (X, Y, Z) each [..., D, n].  Returns [..., n] tuple.
    """

    def shift_tuple(pts, sh):
        X, Y, Z = pts
        a = X.ndim - 2
        sl = [slice(None)] * X.ndim
        sl[a] = slice(sh, None)
        pad_shape = X.shape[:a] + (sh,) + X.shape[a + 1:]
        zero = jnp.zeros(pad_shape, dtype=X.dtype)
        one = jnp.broadcast_to(spec.one_mont, pad_shape)
        return (jnp.concatenate([X[tuple(sl)], zero], axis=a),
                jnp.concatenate([Y[tuple(sl)], one], axis=a),
                jnp.concatenate([Z[tuple(sl)], zero], axis=a))

    D = buckets[0].shape[-2]
    T = buckets
    sh = 1
    while sh < D:
        T = proj.add(spec, T, shift_tuple(T, sh))
        sh *= 2
    return proj.tree_add(spec, T, axis_from_end=0)


def msm_instances(curve, points_affine, scalars_normal,
                  points_sel=("id",), digits_sel=("id",), NI: int = None,
                  wbits: int = 8, interpret: bool = False):
    """NI independent MSMs via the generalized fused bucket kernel.

    points_affine: (px, py, pinf) with point-set rows [G, N(, n)];
    scalars_normal: digit rows [Gd, N, 16].  Instance i uses point row
    points_sel(i) and scalar row digits_sel(i) (("id",), ("div", k),
    ("mod", k)).  Returns a Jacobian tuple with batch [NI].

    Falls back to the XLA scan formulation (msm_core) when Pallas is
    unavailable (CPU meshes / tests).
    """
    from .field import _pallas_enabled
    if NI is None:
        NI = scalars_normal.shape[0]

    if not (_pallas_enabled() or interpret):
        def sel(rows, s):
            if s[0] == "id":
                return rows
            idx = (np.arange(NI) // s[1] if s[0] == "div"
                   else np.arange(NI) % s[1])
            return jnp.take(rows, idx, axis=0)

        pts = tuple(sel(c, points_sel) for c in points_affine)
        sc = sel(scalars_normal, digits_sel)
        return msm_core(curve, pts, sc, window=min(wbits, 8))

    from . import pallas_msm2
    spec = curve.F
    px, py, pinf = points_affine
    prepped = pallas_msm2.prep_points(px, py, pinf, wbits)
    packed = pallas_msm2.pack_digits_inst(scalars_normal, wbits)
    buckets = pallas_msm2.bucket_phase_inst(
        spec, prepped, packed, NI, points_sel, digits_sel, wbits, interpret)
    # [NI, C_IN, W, D, n] projective -> tree-add chunks -> weighted sum
    merged = proj.tree_add(spec, buckets, axis_from_end=2)    # [NI, W, D]
    ws = _proj_weighted_sum(spec, merged)                     # [NI, W] proj
    ws_jac = proj.to_jacobian(spec, ws)
    return combine_window_sums(curve, ws_jac, window=wbits)


def msm_naive(curve, points_affine, scalars_normal):
    """Differential-test oracle: sum of per-point scalar muls."""
    px, py, pinf = points_affine
    jac = curve.from_affine(px, py, pinf)
    prods = curve.scalar_mul_fr(jac, scalars_normal)  # scan over bits, batched
    acc = tuple(c[0] for c in prods)
    for i in range(1, px.shape[0]):
        acc = curve.add(acc, tuple(c[i] for c in prods))
    return acc


def msm_fixed_base_rns(curve, table_u16, scalars_normal, wbits: int = 8,
                       interpret: bool = False):
    """Batched fixed-base MSM on the RNS Pallas kernel (round 5).

    table_u16: (tx, ty) [PT, D, 2k, L] u16 from pallas_rns.build_rns_table;
    scalars_normal: [B, N, 16].  Returns a positional-Montgomery Jacobian
    tuple [B] — drop-in for msm_fixed_base.

    Tail: lane tree-add in XLA RNS (8k point-adds, ms), exact CRT limbs,
    then one positional Montgomery mul by R16^2 * M_A^{-1} mod p converts
    each coordinate from the RNS Montgomery domain (value * M_A) to the
    positional one (value * R16).
    """
    from . import pallas_rns, pallas_tablemsm
    from .rns import fp_rns
    from .rns_jax import RNSOps
    from .rns_msm import RNSCurve

    F = curve.F
    spec = fp_rns()
    ops = RNSOps(spec)
    packed = pallas_tablemsm.pack_digits_lanes(scalars_normal, wbits=wbits)
    acc = pallas_rns.rns_table_msm(spec, table_u16, packed,
                                   interpret=interpret)   # [B, L, 2k]
    return rns_acc_to_jacobian(F, ops, acc)


def rns_acc_to_proj(F, ops, acc):
    """RNS projective tuple (any batch shape, residue axis last) ->
    positional-Montgomery projective (X, Y, Z) limb arrays (same domain
    conversion as rns_acc_to_jacobian, no lane reduction)."""
    spec = ops.spec
    conv = np.array(F.from_int(
        pow(2, 16 * F.n, F.modulus) * pow(int(spec.A.M), -1, F.modulus)
        % F.modulus), dtype=np.uint32)
    return tuple(F.mul(ops.to_value_limbs(c), conv) for c in acc)


def rns_acc_to_jacobian(F, ops, acc):
    """RNS projective per-lane partials [B, L, 2k] -> positional-Montgomery
    Jacobian tuple [B]: lane tree-add (RNS), exact CRT limbs, then one
    positional Montgomery mul converts domains.

    Domain algebra: the CRT limbs hold v = coord * M_A mod p (+ <=2p
    slack); F.mul multiplies by R16^{-1} and F.from_int(c) encodes
    c * R16, so conv = from_int(R16 * M_A^{-1}) gives
    F.mul(v, conv) = v * M_A^{-1} * R16 = coord * R16."""
    from .rns_msm import RNSCurve

    spec = ops.spec
    rcurve = RNSCurve(ops)
    X, Y, Z = rcurve.tree_add(acc, axis_from_end=0)       # [B, 2k]
    vx, vy, vz = (ops.to_value_limbs(c) for c in (X, Y, Z))  # [B, n] < 3p
    conv = np.array(F.from_int(
        pow(2, 16 * F.n, F.modulus) * pow(int(spec.A.M), -1, F.modulus)
        % F.modulus), dtype=np.uint32)
    x, y, z = (F.mul(v, conv) for v in (vx, vy, vz))
    return proj.to_jacobian(F, (x, y, z))
