"""Round-1 Pallas kernels under forced interpret mode (no TPU needed).

VERDICT r1 flagged that the VMEM Montgomery-mul, wide point ops, and the
fused signed-digit bucket kernel were validated only implicitly by the
TPU-gated conformance suite.  These tests pin each kernel bit-identically
against the jnp path (itself pinned to the pure-Python golden model in
test_field.py / test_msm.py) via pltpu.force_tpu_interpret_mode(), with
the edge lanes the signed-digit recoding and complete group law must
handle: zero scalars, r-1, 2^255-1, digit -128 carry chains, infinity
operands, P + P, and P + (-P).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from goethkzg_tpu.constants import P_MOD, R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.ops import field as field_mod
from goethkzg_tpu.ops import msm as msm_mod
from goethkzg_tpu.ops import pallas_curve, pallas_field, pallas_msm
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec, fr_spec, int_to_limbs
from goethkzg_tpu.serialization import g1_points_to_device_arrays

CPU = jax.devices("cpu")[0]
FP = fp_spec()
FR = fr_spec()
CURVE = CurveOps(FP)


@pytest.fixture(autouse=True)
def _cpu_interpret():
    """jnp oracle path on CPU; pallas_* entry points called explicitly
    under force_tpu_interpret_mode inside each test."""
    with field_mod.pallas_disabled(), jax.default_device(CPU):
        yield


def _limbs(vals, spec):
    return jnp.asarray(np.stack([int_to_limbs(v % spec.modulus, spec.n)
                                 for v in vals], dtype=np.uint32))


def _edge_field_vals(spec, count, seed):
    import random
    rng = random.Random(seed)
    m = spec.modulus
    vals = [0, 1, m - 1, m - 2, spec.R_mod, (1 << 16) - 1, 1 << 255 % m]
    vals += [rng.randrange(m) for _ in range(count - len(vals))]
    return vals[:count]


@pytest.mark.parametrize("spec", [FR, FP], ids=["fr", "fp"])
def test_mont_mul_interpret_matches_jnp(spec):
    a_int = _edge_field_vals(spec, 300, 1)
    b_int = _edge_field_vals(spec, 300, 2)
    a, b = _limbs(a_int, spec), _limbs(b_int, spec)
    want = spec.mul(a, b)                       # jnp path (pallas disabled)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_field.mont_mul(spec, a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _gen_points(n, start=1):
    g = gc.g1_generator()
    pts, acc = [], gc.g1_scalar_mul(g, start)
    for _ in range(n):
        pts.append(acc)
        acc = gc.g1_add(acc, g)
    return pts


def _to_jac_mont(pts_affine_arrays):
    """Affine limb arrays (+inf mask) -> Jacobian tuple with Z = 1 or 0."""
    px, py, pinf = pts_affine_arrays
    one = jnp.broadcast_to(FP.one_mont, px.shape)
    zero = jnp.zeros_like(px)
    z = jnp.where(pinf[..., None], zero, one)
    return (jnp.where(pinf[..., None], zero, px),
            jnp.where(pinf[..., None], one, py), z)


def _points_with_edges(n):
    """n affine points incl. an infinity lane and a repeated pair."""
    pts = _gen_points(n - 2, start=3)
    pts = [None, pts[0]] + pts          # infinity lane + duplicate of lane 2
    return pts, g1_points_to_device_arrays(pts)


def test_curve_ops_interpret_match_jnp():
    N = 256                             # = pallas_curve BLOCK lane count
    pts, arrs = _points_with_edges(N)
    p1 = _to_jac_mont(arrs)

    # second operand: reversed points, so lanes include inf+inf, P+inf,
    # inf+P; plus a negated lane and an equal lane for P-P / P+P
    pts2 = list(reversed(pts))
    pts2[7] = (pts[7][0], (-pts[7][1]) % P_MOD) if pts[7] else None  # P + (-P)
    pts2[9] = pts[9]                                                 # P + P
    arrs2 = g1_points_to_device_arrays(pts2)
    p2 = _to_jac_mont(arrs2)

    want_add = CURVE.add(p1, p2)
    want_dbl = CURVE.double(p1)
    want_mix = CURVE.add_affine(p1, (arrs2[0], arrs2[1]),
                                a2_inf=arrs2[2])
    with pltpu.force_tpu_interpret_mode():
        got_add = pallas_curve.add(FP, p1, p2)
        got_dbl = pallas_curve.double(FP, p1)
        got_mix = pallas_curve.add_affine(FP, p1, (arrs2[0], arrs2[1]),
                                          arrs2[2], FP.R_mod)

    for got, want, tag in ((got_add, want_add, "add"),
                           (got_dbl, want_dbl, "double"),
                           (got_mix, want_mix, "add_affine")):
        # Jacobian coords are representative-dependent only across code
        # paths; both paths use identical formulas, so require bit-equality
        for gc_, wc, ax in zip(got, want, "XYZ"):
            np.testing.assert_array_equal(
                np.asarray(gc_), np.asarray(wc), err_msg=f"{tag}.{ax}")


EDGE_SCALARS = [0, 1, R_MOD - 1, (1 << 255) - 1,
                int.from_bytes(b"\x80" * 31, "big"),
                int.from_bytes(b"\x7f\x80" * 15 + b"\x80", "big")]


def test_fused_bucket_msm_interpret_matches_golden():
    """Full fused-branch pipeline of msm_core (bucket_phase kernel + the
    signed-digit tail) under interpret mode vs the golden oracle."""
    N, B = 512, 2
    import random
    rng = random.Random(7)
    pts, arrs = _points_with_edges(N)
    scalars = [EDGE_SCALARS + [rng.randrange(1 << 255)
                               for _ in range(N - len(EDGE_SCALARS))]
               for _ in range(B)]
    sc = jnp.asarray(np.stack(
        [[int_to_limbs(s, 16) for s in row] for row in scalars],
        dtype=np.uint32))

    with pltpu.force_tpu_interpret_mode():
        buckets = pallas_msm.bucket_phase(FP, arrs, sc, FP.R_mod)
    merged = msm_mod._tree_add(CURVE, buckets, axis_from_end=2)
    window_sums = msm_mod._weighted_bucket_sum(CURVE, merged, drop_zero=False)
    res = msm_mod.combine_window_sums(CURVE, window_sums, window=8)

    ax, ay, ainf = (np.asarray(c) for c in CURVE.to_affine(res))
    for b in range(B):
        acc = None
        for p, s in zip(pts, scalars[b]):
            if p is None or s == 0:
                continue
            acc = gc.g1_add(acc, gc.g1_scalar_mul(p, s))
        if acc is None:
            assert bool(ainf[b])
        else:
            assert not bool(ainf[b])
            assert (FP.to_int(ax[b]), FP.to_int(ay[b])) == acc, f"blob {b}"
