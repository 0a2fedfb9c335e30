"""Insecure structured reference strings for testing.

Mirrors the reference's test-only SRS generators with a known secret
(reference: internal/kzg/srs_insecure.go:19,60 — secrets 1234/100; the
embedded production-shaped test setup uses secret 1337).  NEVER use in
production.
"""

from ..constants import R_MOD
from . import curve as gcurve


def lagrange_coeffs_at(alpha: int, n: int, generator: int):
    """ell_i(alpha) for the size-n roots-of-unity domain, natural order.

    ell_i(alpha) = w^i (alpha^n - 1) / (n (alpha - w^i)); if alpha is the
    i-th root, ell_i = 1 and the rest 0.
    """
    r = R_MOD
    w = [pow(generator, i, r) for i in range(n)]
    if pow(alpha, n, r) == 1:
        return [1 if alpha % r == wi else 0 for wi in w]
    an = (pow(alpha, n, r) - 1) % r
    n_inv = pow(n, -1, r)
    out = []
    for wi in w:
        denom_inv = pow((alpha - wi) % r, -1, r)
        out.append(wi * an % r * n_inv % r * denom_inv % r)
    return out


def insecure_srs(n: int, secret: int, n_g2: int = 2, generator: int = None):
    """Returns (monomial_g1, lagrange_g1, g2_points) as golden affine points.

    monomial_g1[i] = [secret^i] G1 ; lagrange over the natural-order domain.
    """
    from ..ops.ntt import root_of_unity
    g = generator if generator is not None else root_of_unity(n)
    g1 = gcurve.g1_generator()
    g2 = gcurve.g2_generator()
    mono = []
    acc = 1
    for _ in range(n):
        mono.append(gcurve.g1_scalar_mul(g1, acc))
        acc = acc * secret % R_MOD
    lag = [gcurve.g1_scalar_mul(g1, c) for c in lagrange_coeffs_at(secret, n, g)]
    g2s = []
    acc = 1
    for _ in range(n_g2):
        g2s.append(gcurve.g2_scalar_mul(g2, acc))
        acc = acc * secret % R_MOD
    return mono, lag, g2s
