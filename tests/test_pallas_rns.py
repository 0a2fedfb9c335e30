"""Interpret-mode exactness of the RNS Pallas kernels vs the golden
RNSSpec model (ops/rns.py) — the same contract rns_jax is pinned to."""

import random

import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD, R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden import field as gf
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops.rns import fp_rns, fr_rns


@pytest.mark.parametrize("specf,p", [(fr_rns, R_MOD), (fp_rns, P_MOD)])
def test_mont_mul_rns_matches_golden(specf, p):
    from goethkzg_tpu.ops.pallas_rns import mont_mul_rns
    spec = specf()
    rng = np.random.default_rng(5)
    N = 9
    xs = [int(x) % (4 * p) for x in
          (rng.integers(0, 1 << 63, size=(N, 7)).astype(object)
           @ (1 << (63 * np.arange(7, dtype=object))))]
    ys = [int(x) % (4 * p) for x in
          (rng.integers(0, 1 << 63, size=(N, 7)).astype(object)
           @ (1 << (63 * np.arange(7, dtype=object))))]
    X = np.stack([np.array(spec.to_rns(v), dtype=np.uint32) for v in xs])
    Y = np.stack([np.array(spec.to_rns(v), dtype=np.uint32) for v in ys])
    got = np.asarray(mont_mul_rns(spec, X, Y, interpret=True))
    for i in range(N):
        want = spec.mul([int(v) for v in X[i]], [int(v) for v in Y[i]])
        assert got[i].tolist() == [int(w) for w in want], f"row {i}"


def test_mont_mul_rns_depth_chain():
    from goethkzg_tpu.ops.pallas_rns import mont_mul_rns
    spec = fr_rns()
    rng = np.random.default_rng(7)
    x = int(rng.integers(1, 1 << 60)) % spec.p
    y = int(rng.integers(1, 1 << 60)) % spec.p
    X = np.array(spec.to_rns(x), dtype=np.uint32)[None]
    Y = np.array(spec.to_rns(y), dtype=np.uint32)[None]
    got = np.asarray(mont_mul_rns(spec, X, Y, depth=3, interpret=True))[0]
    want = [int(v) for v in X[0]]
    for _ in range(3):
        want = spec.mul(want, [int(v) for v in Y[0]])
    assert got.tolist() == [int(w) for w in want]


def _host_rns_table(spec, points, N, wbits, L=128):
    """Tiny golden-built u16 RNS digit table [PT, D, 2k, L], commit
    ("wN") pair order: pair p = w*N + i -> (pt, lane), digit row d-1
    holds (d) * 2^(wbits*w) * P_i in RNS-Montgomery canonical residues."""
    W = 256 // wbits
    D = 1 << (wbits - 1)
    PT = (N * W) // L
    nr = 2 * spec.k
    tx = np.zeros((PT, D, nr, L), dtype=np.uint16)
    ty = np.zeros((PT, D, nr, L), dtype=np.uint16)
    for w in range(W):
        for i in range(N):
            p = w * N + i
            pt, lane = divmod(p, L)
            base = gc.g1_scalar_mul(points[i], pow(2, wbits * w, R_MOD))
            cur = None
            for d in range(D):
                cur = gc.g1_add(cur, base)
                tx[pt, d, :, lane] = spec.to_mont_rns(cur[0])
                ty[pt, d, :, lane] = spec.to_mont_rns(cur[1])
    return tx, ty


def _rns_proj_to_golden(spec, X, Y, Z):
    MAinv = pow(spec.A.M, -1, spec.p)

    def val(r):
        return spec.value([int(v) for v in r]) * MAinv % spec.p

    x, y, z = val(X), val(Y), val(Z)
    if z == 0:
        return None
    zi = gf.fp_inv(z)
    return (x * zi % P_MOD, y * zi % P_MOD)


def test_rns_acc_to_jacobian_domain_conversion():
    """The RNS -> positional-Montgomery Jacobian tail (lane tree-add +
    exact CRT + one domain-conversion mul) on a tiny 2-lane accumulator."""
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu.ops import field as field_mod
    from goethkzg_tpu.ops.field import fp_spec
    from goethkzg_tpu.ops.msm import rns_acc_to_jacobian
    from goethkzg_tpu.ops.rns_jax import RNSOps

    spec = fp_rns()
    ops = RNSOps(spec)
    F = fp_spec()
    g = gc.g1_generator()
    p2 = gc.g1_add(g, g)
    one = np.array(spec.to_rns(spec.R % spec.p), dtype=np.uint32)

    def enc(pt):
        return (np.array(spec.to_mont_rns(pt[0]), dtype=np.uint32),
                np.array(spec.to_mont_rns(pt[1]), dtype=np.uint32), one)

    lanes = [enc(g), enc(p2)]                      # acc [1, 2, 2k]
    X = np.stack([l[0] for l in lanes])[None]
    Y = np.stack([l[1] for l in lanes])[None]
    Z = np.stack([l[2] for l in lanes])[None]
    with field_mod.pallas_disabled(), \
            jax.default_device(jax.devices("cpu")[0]):
        jx, jy, jz = (np.asarray(c) for c in jax.jit(
            lambda a: rns_acc_to_jacobian(F, ops, a))(
                (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))))
    # decode positional Montgomery Jacobian -> golden affine
    x, y, z = F.to_int(jx[0]), F.to_int(jy[0]), F.to_int(jz[0])
    zi = gf.fp_inv(z)
    got = (x * zi * zi % P_MOD, y * zi * zi % P_MOD * zi % P_MOD)
    assert got == gc.g1_add(g, p2)


@pytest.mark.parametrize("wbits", [4, 8])
def test_rns_table_msm_kernel_vs_golden(wbits):
    """Interpret-mode kernel on a tiny host-built table; lanes folded on
    the host through the golden group law (no CPU XLA compiles)."""
    import jax.numpy as jnp
    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    from goethkzg_tpu.ops.field import int_to_limbs
    from goethkzg_tpu.ops.pallas_rns import rns_table_msm

    spec = fp_rns()
    N, B = 8, 2
    _, lag, _ = insecure_srs(N, secret=4321)
    tx, ty = _host_rns_table(spec, lag, N, wbits)

    rng = random.Random(11)
    scalars = [[rng.randrange(R_MOD) for _ in range(N)] for _ in range(B)]
    scal_limbs = np.stack([
        np.stack([int_to_limbs(s, 16) for s in row]) for row in scalars])
    packed = np.asarray(ptm.pack_digits_lanes(jnp.asarray(scal_limbs),
                                              wbits=wbits))

    X, Y, Z = (np.asarray(c) for c in rns_table_msm(
        spec, (jnp.asarray(tx), jnp.asarray(ty)), jnp.asarray(packed),
        interpret=True))                                  # [B, L, 2k]

    for b in range(B):
        got = None
        for lane in range(X.shape[1]):
            got = gc.g1_add(got, _rns_proj_to_golden(
                spec, X[b, lane], Y[b, lane], Z[b, lane]))
        want = None
        for p, s in zip(lag, scalars[b]):
            want = gc.g1_add(want, gc.g1_scalar_mul(p, s))
        assert got == want, f"blob {b} (wbits={wbits})"
