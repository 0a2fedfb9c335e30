"""Coefficient-form polynomial helpers (reference: internal/poly/poly.go).

The reference keeps a small coefficient-arithmetic layer — add (poly.go:17),
schoolbook mul (poly.go:45), Horner eval (poly.go:96), synthetic division
by (X - a) (poly.go:113) — used by its erasure code and as the naive
oracle of the differential tests.  This is the TPU formulation: every op
is vectorized over STATIC-length limb arrays [..., L, n] in Montgomery
form with arbitrary leading batch axes, and sequential recurrences ride
`lax.scan` (compiler-friendly control flow, no data-dependent shapes).

The reference's trailing-zero normalization (poly.go:142) has no static-
shape analog; callers track true degrees explicitly (a length-L array
represents a polynomial of degree < L, higher coefficients zero).
"""

import jax
import jax.numpy as jnp


def poly_add(F, a, b):
    """a + b, zero-padding the shorter coefficient array (poly.go:17-36)."""
    La, Lb = a.shape[-2], b.shape[-2]
    if La < Lb:
        a, b = b, a
        La, Lb = Lb, La
    if Lb < La:
        pad_shape = b.shape[:-2] + (La - Lb, b.shape[-1])
        b = jnp.concatenate([b, jnp.zeros(pad_shape, b.dtype)], axis=-2)
    return F.add(a, b)


def poly_mul(F, a, b):
    """Schoolbook product, vectorized (poly.go:45-68).

    a [..., La, n] x b [..., Lb, n] -> [..., La+Lb-1, n]: all pairwise
    coefficient products in one batched Montgomery mul, then each output
    coefficient k is a masked tree-sum over the anti-diagonal i + j = k.
    The reference only ever multiplies short polynomials (vanishing polys
    of <= 64 factors), so the O(La*Lb) one-shot formulation beats an NTT
    and keeps every lane busy.
    """
    import numpy as np

    La, Lb = a.shape[-2], b.shape[-2]
    K = La + Lb - 1
    prod = F.mul(a[..., :, None, :], b[..., None, :, :])   # [..., La, Lb, n]
    flat = prod.reshape(prod.shape[:-3] + (La * Lb, prod.shape[-1]))
    i = np.arange(La)[:, None]
    j = np.arange(Lb)[None, :]
    diag = (i + j).reshape(-1)                              # [La*Lb]
    k = np.arange(K)[:, None]                               # [K, 1]
    mask = (diag[None, :] == k)[..., None]                  # [K, La*Lb, 1]
    terms = jnp.where(mask, flat[..., None, :, :],
                      jnp.zeros((), dtype=flat.dtype))      # [..., K, La*Lb, n]
    return F.sum(terms, axis=-2)                            # [..., K, n]


def poly_eval(F, a, z):
    """Horner evaluation at z (poly.go:96-110).

    a [..., L, n] ascending coefficients, z [..., n] -> [..., n].
    """
    hi_first = jnp.moveaxis(a, -2, 0)[::-1]                 # [L, ..., n]

    def body(acc, coeff):
        return F.add(F.mul(acc, z), coeff), None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(z), hi_first)
    return acc


def divide_by_x_minus_a(F, a, z):
    """Synthetic division a(X) = q(X)*(X - z) + r (poly.go:113-139).

    a [..., L, n] ascending -> (q [..., L-1, n], r [..., n]).  Exact
    division (r == 0) iff a(z) == 0; r always equals a(z).
    """
    hi_first = jnp.moveaxis(a, -2, 0)[::-1]                 # [L, ..., n]
    lead, rest = hi_first[0], hi_first[1:]

    def body(acc, coeff):
        nxt = F.add(F.mul(acc, z), coeff)
        return nxt, acc

    r, qs = jax.lax.scan(body, lead, rest)                  # qs hi-first [L-1]
    q = jnp.moveaxis(qs[::-1], 0, -2)
    return q, r
