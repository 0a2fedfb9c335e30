"""Multi-scalar multiplication (Pippenger) for TPU.

The TPU-native analog of gnark's Pippenger MultiExp (reference:
internal/multiexp/multiexp.go:20-34).  Branch-free formulation shaped for
a vector machine:

* window digits are extracted vectorized from 16-bit limbs;
* the point axis is split into chunks that bucket-accumulate *in parallel*
  (vmapped `lax.scan` whose body does one complete mixed addition per
  (chunk, window) lane), then chunk bucket arrays merge with a log-depth
  tree of wide complete adds — this turns the classic sequential bucket
  walk into ~N/chunks sequential steps of wide VPU ops;
* the weighted bucket reduction sum_d d*B_d uses a Hillis–Steele suffix
  scan (log2(buckets) shifted wide adds) + a log-depth tree sum, instead
  of a 2^w-step scan;
* windows are combined with a Horner chain of doublings (the only
  inherently sequential part: the top window needs 8*(W-1) squarings).

Batching over independent MSMs (the blob axis) is via `jax.vmap`; points may
be shared (in_axes=None) or per-instance.
"""

import jax
import jax.numpy as jnp


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
    shifts = jnp.arange(per_limb, dtype=jnp.uint32) * window
    mask = jnp.uint32((1 << window) - 1)
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
        a = ax(pts[0])

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


def _bucket_accumulate(curve, px, py, pinf, digits, num_buckets,
                       vary_axes=()):
    """Sequential bucket scatter over one point chunk.

    px/py: [N, *e]; pinf: [N]; digits: [N, W].
    Returns bucket arrays [W, num_buckets, *e].
    """
    W = digits.shape[-1]
    bshape = (W, num_buckets)
    buckets = _pvary(curve.infinity(bshape), vary_axes)
    w_idx = jnp.arange(W)

    def body(buckets, inp):
        x, y, inf, d = inp
        cur = tuple(b[w_idx, d] for b in buckets)  # [W, *e]
        ex = jnp.broadcast_to(x, (W,) + x.shape)
        ey = jnp.broadcast_to(y, (W,) + y.shape)
        einf = jnp.broadcast_to(inf, (W,))
        new = curve.add_affine(cur, (ex, ey), a2_inf=einf)
        buckets = tuple(b.at[w_idx, d].set(v) for b, v in zip(buckets, new))
        return buckets, None

    buckets, _ = jax.lax.scan(body, buckets, (px, py, pinf, digits))
    return buckets


def _weighted_bucket_sum(curve, buckets, vary_axes=()):
    """S_w = sum_{d=1}^{D-1} d * B_{w,d} in log depth.

    buckets: tuple of [W, D, *e].  Uses the suffix-sum identity
    sum_d d*B_d = sum_{d>=1} T_d with T_d = sum_{e>=d} B_e: a Hillis–Steele
    suffix scan (log2(D) wide adds) followed by a tree sum over d.
    """
    td = curve.F.trailing_dims
    D = buckets[0].shape[-td - 1]

    def shift_down(c, sh):
        a = c.ndim - td - 1
        sl = [slice(None)] * c.ndim
        sl[a] = slice(sh, None)
        pad_shape = c.shape[:a] + (sh,) + c.shape[a + 1:]
        return jnp.concatenate(
            [c[tuple(sl)], jnp.zeros(pad_shape, dtype=c.dtype)], axis=a)

    T = buckets
    sh = 1
    while sh < D:
        T = curve.add(T, tuple(shift_down(c, sh) for c in T))
        sh *= 2
    # drop bucket 0 (digit 0 contributes nothing), sum T_1..T_{D-1}
    def drop0(c):
        a = c.ndim - td - 1
        sl = [slice(None)] * c.ndim
        sl[a] = slice(1, None)
        return c[tuple(sl)]

    return _tree_add(curve, tuple(drop0(c) for c in T), axis_from_end=0)


def _auto_chunks(n: int) -> int:
    """Point-axis parallelism: enough lanes to keep the VPU busy without
    blowing up the bucket-array memory (chunks*W*2^w points live at once)."""
    c = 1
    while c < 8 and n % (2 * c) == 0 and n // (2 * c) >= 64:
        c *= 2
    return c


def msm(curve, points_affine, scalars_normal, window: int = 8,
        vary_axes=(), chunks: int | None = None):
    """Single MSM: sum_i scalars[i] * P_i  (Pippenger, bucket window `window`).

    points_affine: (x [N, *e], y [N, *e], inf [N]) in Montgomery form.
    scalars_normal: [N, 16] uint32 limbs, canonical (non-Montgomery).
    Returns a Jacobian point.  Small windows (4) suit small N; 8 suits
    thousands of points.  vary_axes: shard_map axis names the inputs vary
    over (needed so scan-carry inits typecheck under shard_map).
    """
    window_sums = msm_window_sums(curve, points_affine, scalars_normal, window,
                                  vary_axes, chunks)
    return combine_window_sums(curve, window_sums, window, vary_axes)


def msm_window_sums(curve, points_affine, scalars_normal, window: int = 8,
                    vary_axes=(), chunks: int | None = None):
    """Pippenger bucket phase: per-window sums S_w (Jacobian, lane axis W).

    Exposed separately so the point-sharded multi-chip MSM (parallel/) can
    all-gather partial window sums across devices before the Horner combine.
    """
    px, py, pinf = points_affine
    digits = fr_digits(scalars_normal, window)  # [N, W]
    num_buckets = 1 << window
    n = px.shape[0]
    c = _auto_chunks(n) if chunks is None else chunks

    if c > 1:
        def split(a):
            return a.reshape((c, n // c) + a.shape[1:])

        buckets = jax.vmap(
            lambda x, y, i, d: _bucket_accumulate(
                curve, x, y, i, d, num_buckets, vary_axes),
            in_axes=(0, 0, 0, 0))(split(px), split(py), split(pinf),
                                  split(digits))
        # merge chunk bucket arrays: [c, W, D, *e] -> [W, D, *e]
        buckets = _tree_add(curve, buckets, axis_from_end=2)
    else:
        buckets = _bucket_accumulate(curve, px, py, pinf, digits,
                                     num_buckets, vary_axes)

    return _weighted_bucket_sum(curve, buckets, vary_axes)


def combine_window_sums(curve, window_sums, window: int = 8, vary_axes=()):
    """Horner combine over windows, MSB window first (scan; doubling the
    initial infinity is a harmless no-op)."""
    def horner_body(acc, s_w):
        for _ in range(window):
            acc = curve.double(acc)
        return curve.add(acc, s_w), None

    ws_msb_first = tuple(c[::-1] for c in window_sums)
    init = _pvary(curve.infinity(()), vary_axes)
    result, _ = jax.lax.scan(horner_body, init, ws_msb_first)
    return result


def msm_batched(curve, points_affine, scalars_normal, shared_points: bool):
    """vmap over a leading batch axis of scalars (and points unless shared)."""
    in_axes = (None if shared_points else (0, 0, 0), 0)
    return jax.vmap(lambda pts, s: msm(curve, pts, s), in_axes=in_axes)(
        points_affine, scalars_normal)


def msm_naive(curve, points_affine, scalars_normal):
    """Differential-test oracle: sum of per-point scalar muls."""
    px, py, pinf = points_affine
    jac = curve.from_affine(px, py, pinf)
    prods = curve.scalar_mul_fr(jac, scalars_normal)  # scan over bits, batched
    acc = tuple(c[0] for c in prods)
    for i in range(1, px.shape[0]):
        acc = curve.add(acc, tuple(c[i] for c in prods))
    return acc
