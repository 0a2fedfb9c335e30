"""Multi-scalar multiplication (Pippenger) for TPU.

The TPU-native analog of gnark's Pippenger MultiExp (reference:
internal/multiexp/multiexp.go:20-34).  Branch-free formulation:

* window digits are extracted vectorized from 16-bit limbs,
* bucket accumulation is a `lax.scan` over points whose body does one
  *complete* mixed addition per window lane (all windows in parallel),
* the weighted bucket reduction sum_d d*B_d is computed as a log-depth
  Hillis–Steele suffix scan followed by a binary-tree reduction (wide VPU
  ops instead of the sequential bucket walk a CPU implementation uses),
* windows are combined with a Horner chain of doublings.

Batching over independent MSMs (the blob axis) is via `jax.vmap`; points may
be shared (in_axes=None) or per-instance.
"""

import jax
import jax.numpy as jnp

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


def msm(curve, points_affine, scalars_normal, window: int = 8):
    """Single MSM: sum_i scalars[i] * P_i  (Pippenger, bucket window `window`).

    points_affine: (x [N, *e], y [N, *e], inf [N]) in Montgomery form.
    scalars_normal: [N, 16] uint32 limbs, canonical (non-Montgomery).
    Returns a Jacobian point.  Small windows (4) suit small N; 8 suits
    thousands of points.
    """
    window_sums = msm_window_sums(curve, points_affine, scalars_normal, window)
    return combine_window_sums(curve, window_sums, window)


def msm_window_sums(curve, points_affine, scalars_normal, window: int = 8):
    """Pippenger bucket phase: per-window sums S_w (Jacobian, lane axis W).

    Exposed separately so the point-sharded multi-chip MSM (parallel/) can
    all-gather partial window sums across devices before the Horner combine.
    """
    F = curve.F
    px, py, pinf = points_affine
    digits = fr_digits(scalars_normal, window)  # [N, W]
    W = digits.shape[-1]
    num_buckets = 1 << window

    bshape = (W, num_buckets)
    buckets = curve.infinity(bshape)
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

    # Weighted reduction S_w = sum_{d=1..255} d * B_{w,d} via the classic
    # running/accumulator pair, as a scan over bucket index d = 255..1
    # (each step is a [W]-wide pair of complete adds).
    def red_body(state, bucket_d):
        running, acc = state
        running = curve.add(running, bucket_d)
        acc = curve.add(acc, running)
        return (running, acc), None

    inf_w = curve.infinity((W,))
    rev_buckets = tuple(
        jnp.moveaxis(b[:, :0:-1], 1, 0) for b in buckets)  # [2^w - 1, W, *e]
    (_, window_sums), _ = jax.lax.scan(red_body, (inf_w, inf_w), rev_buckets)
    return window_sums


def combine_window_sums(curve, window_sums, window: int = 8):
    """Horner combine over windows, MSB window first (scan; doubling the
    initial infinity is a harmless no-op)."""
    def horner_body(acc, s_w):
        for _ in range(window):
            acc = curve.double(acc)
        return curve.add(acc, s_w), None

    ws_msb_first = tuple(c[::-1] for c in window_sums)
    result, _ = jax.lax.scan(horner_body, curve.infinity(()), ws_msb_first)
    return result


def msm_batched(curve, points_affine, scalars_normal, shared_points: bool):
    """vmap over a leading batch axis of scalars (and points unless shared)."""
    pts_axes = None if shared_points else ((0, 0, 0),)
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
