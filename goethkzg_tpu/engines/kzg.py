"""Single-point KZG engine: Lagrange evaluation, quotient polynomials, commit.

TPU-native re-design of the reference prover/verifier core
(reference: internal/kzg/kzg_prove.go, internal/domain/domain.go:179-235):

* the linear root scan + barycentric loop become one fused vectorized kernel
  (vector compare for on-domain detection, masked one-hot gathers instead of
  indexing, a single log-depth batched inversion shared by evaluation and
  quotient);
* the on-domain and outside-domain quotient paths are computed branch-free
  and blended with masks, so one compiled graph serves every input;
* everything carries arbitrary leading batch dims (the blob axis is the
  data-parallel axis sharded in `parallel/`).

All values in Montgomery form unless noted.
"""

import jax.numpy as jnp

from ..ops.field import fr_spec


def eval_lagrange(roots_brp, roots_brp_inv, n_inv_mont, poly, z):
    """Evaluate a Lagrange-form polynomial (brp convention) at z.

    poly: [..., N, 16], z: [..., 16] (both Montgomery).
    Returns (y [..., 16], in_domain [...], eq_mask [..., N], inv_d [..., N, 16])
    where inv_d = 1/(z - w_i) with the on-domain slot mapped through 1/1.
    """
    fr = fr_spec()
    N = roots_brp.shape[0]
    eq_mask = fr.eq(z[..., None, :], roots_brp)  # [..., N]
    in_domain = jnp.any(eq_mask, axis=-1)

    d = fr.sub(z[..., None, :], roots_brp)
    one = jnp.broadcast_to(fr.one_mont, d.shape)
    d_safe = fr.select(eq_mask, one, d)
    inv_d = fr.batch_inv(d_safe)

    terms = fr.mul(fr.mul(poly, roots_brp), inv_d)
    s = fr.sum(terms)
    zn = z
    k = N
    while k > 1:
        zn = fr.sqr(zn)
        k //= 2
    t = fr.mul(fr.sub(zn, fr.one_mont), n_inv_mont)
    y_out = fr.mul(t, s)

    y_in = fr.sum(jnp.where(eq_mask[..., None], poly, jnp.zeros_like(poly)))
    y = fr.select(in_domain, y_in, y_out)
    return y, in_domain, eq_mask, inv_d


def quotient_poly(roots_brp, roots_brp_inv, n_inv_mont, poly, z):
    """q(X) = (f(X) - f(z)) / (X - z) in Lagrange (brp) form, both domain paths.

    Returns (y, q) with q: [..., N, 16] Montgomery.
    reference: internal/kzg/kzg_prove.go:62-180.
    """
    fr = fr_spec()
    y, in_domain, eq_mask, inv_d = eval_lagrange(
        roots_brp, roots_brp_inv, n_inv_mont, poly, z)

    # 1/(w_i - z) = -1/(z - w_i); on-domain slot: (f_m - y) = 0 anyway.
    inv_rz = fr.neg(inv_d)
    q = fr.mul(fr.sub(poly, y[..., None, :]), inv_rz)

    # On-domain correction term for slot m:
    #   q_m = -(1/z) * sum_j q_j * w_j     (reference kzg_prove.go:118-180)
    zinv = fr.sum(jnp.where(eq_mask[..., None], roots_brp_inv,
                            jnp.zeros_like(q)))
    q_m = fr.neg(fr.mul(zinv, fr.sum(fr.mul(q, roots_brp))))
    q = fr.select(eq_mask, q_m[..., None, :], q)
    return y, q
