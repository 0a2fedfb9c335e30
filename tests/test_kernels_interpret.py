"""Pallas kernel correctness via interpret mode (no TPU needed).

Runs the round-2 MSM kernels — fixed-base table MSM (both digit layouts)
and the generalized per-instance bucket kernel — through
pl.pallas_call(interpret=True) on CPU against the XLA msm_core oracle
(itself pinned to the golden model in test_msm.py).  Covers the digit
edge cases the signed recoding must handle: zero scalars, r-1, 2^255-1,
all-0x80 bytes (digit -128 + carry), infinity points, and the div/mod
instance-wiring of the generalized kernel.
"""

import jax
import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD, R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.ops import msm as msm_mod
from goethkzg_tpu.ops import proj
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec, int_to_limbs
from goethkzg_tpu.serialization import g1_points_to_device_arrays

CPU = jax.devices("cpu")[0]
FP = fp_spec()
CURVE = CurveOps(FP)


@pytest.fixture(autouse=True)
def _cpu_jnp():
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled(), jax.default_device(CPU):
        yield


def _gen_points(n, start=1):
    """(start + i) * G as golden affine tuples — cheap doubling-free chain."""
    g = gc.g1_generator()
    pts = []
    acc = gc.g1_scalar_mul(g, start)
    for _ in range(n):
        pts.append(acc)
        acc = gc.g1_add(acc, g)
    return pts


EDGE_SCALARS = [0, 1, R_MOD - 1, (1 << 255) - 1,
                int.from_bytes(b"\x80" * 31, "big"),
                int.from_bytes(b"\x7f\x80" * 15 + b"\x80", "big")]


def _scalars(n, seed):
    import random
    rng = random.Random(seed)
    out = [EDGE_SCALARS[i % len(EDGE_SCALARS)] for i in range(min(n, 6))]
    out += [rng.randrange(1 << 255) for _ in range(n - len(out))]
    return out


def _limbs(scalars):
    return np.stack([int_to_limbs(s, 16) for s in scalars])


def _jac_to_golden(res, i=None):
    pts = tuple(c if i is None else c[i] for c in res)
    ax, ay, ainf = (np.asarray(a) for a in CURVE.to_affine(
        tuple(np.asarray(c)[None] for c in pts)))
    if bool(ainf[0]):
        return None
    return (FP.to_int(ax[0]), FP.to_int(ay[0]))


def _oracle(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        if p is None or s == 0:
            continue
        acc = gc.g1_add(acc, gc.g1_scalar_mul(p, s))
    return acc


@pytest.mark.parametrize("wbits,B", [(8, 2), (4, 2)])
def test_table_msm_commit_layout(wbits, B):
    """Lane-spread layout + projective lane reduction vs golden."""
    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    N = 32 if wbits == 8 else 16
    pts = _gen_points(N, start=3)
    arrays = g1_points_to_device_arrays(pts)
    table = ptm.build_table_device(CURVE, arrays, wbits=wbits, pair_order="wN")
    scal = [_scalars(N, seed=11 + b) for b in range(B)]
    slimbs = np.stack([_limbs(s) for s in scal])
    res = msm_mod.msm_fixed_base(CURVE, table, slimbs, interpret=True,
                                 wbits=wbits)
    for b in range(B):
        assert _jac_to_golden(res, b) == _oracle(pts, scal[b]), f"blob {b}"


def test_table_msm_batch_tiling():
    """TB < B: accumulator batch tiles revisit the table; bit-identical."""
    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    N, B = 16, 4
    pts = _gen_points(N, start=9)
    arrays = g1_points_to_device_arrays(pts)
    table = ptm.build_table_device(CURVE, arrays, wbits=4, pair_order="wN")
    scal = [_scalars(N, seed=40 + b) for b in range(B)]
    slimbs = np.stack([_limbs(s) for s in scal])
    packed = ptm.pack_digits_lanes(jax.numpy.asarray(slimbs), wbits=4)
    full = ptm.table_msm(FP, table, packed, interpret=True, TB=B)
    tiled = ptm.table_msm(FP, table, packed, interpret=True, TB=2)
    for a, b in zip(full, tiled):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    jac = proj.to_jacobian(FP, proj.tree_add(FP, tiled, axis_from_end=0))
    for b in range(B):
        assert _jac_to_golden(jac, b) == _oracle(pts, scal[b]), f"blob {b}"


def test_table_msm_output_lane_layout():
    """wbits=4 FK20 layout: lane k accumulates output k, no reduction."""
    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    K, V = 128, 2                      # 128 outputs, 2 points each
    pts = _gen_points(K * V, start=7)  # point i = v*K + k
    arrays = g1_points_to_device_arrays(pts)
    table = ptm.build_table_device(CURVE, arrays, wbits=4, pair_order="vW")
    scal = np.array([[_scalars(V, seed=100 + k)[v] for v in range(V)]
                     for k in range(K)], dtype=object)
    slimbs = np.stack([_limbs(list(row)) for row in scal])[None]  # [1,K,V,16]
    packed = ptm.pack_digits_outputs(jax.numpy.asarray(slimbs), wbits=4)
    X, Y, Z = ptm.table_msm(FP, table, packed, interpret=True)
    jac = proj.to_jacobian(FP, (X[0], Y[0], Z[0]))      # [K] points
    for k in range(0, K, 17):
        want = _oracle([pts[v * K + k] for v in range(V)],
                       [int(scal[k, v]) for v in range(V)])
        assert _jac_to_golden(jac, k) == want, f"lane {k}"


@pytest.mark.parametrize("wbits", [4, 8])
def test_msm_instances_kernel(wbits):
    NI, N = 4, 8
    pts = [_gen_points(N, start=5 + 11 * g) for g in range(NI)]
    pts[1][2] = None                       # infinity point with live scalar
    scal = [_scalars(N, seed=200 + g) for g in range(NI)]
    px, py, pinf = zip(*[g1_points_to_device_arrays(p) for p in pts])
    arrays = (np.stack(px), np.stack(py), np.stack(pinf))
    slimbs = np.stack([_limbs(s) for s in scal])
    res = msm_mod.msm_instances(CURVE, arrays, slimbs, wbits=wbits,
                                interpret=True)
    for g in range(NI):
        assert _jac_to_golden(res, g) == _oracle(pts[g], scal[g]), f"inst {g}"


def test_msm_instances_div_mod_wiring():
    """points row = i // 2, digits row = i % 2 over 4 instances."""
    NI, N = 4, 8
    psets = [_gen_points(N, start=21), _gen_points(N, start=51)]
    dsets = [_scalars(N, seed=300), _scalars(N, seed=301)]
    px, py, pinf = zip(*[g1_points_to_device_arrays(p) for p in psets])
    arrays = (np.stack(px), np.stack(py), np.stack(pinf))
    slimbs = np.stack([_limbs(s) for s in dsets])
    res = msm_mod.msm_instances(CURVE, arrays, slimbs,
                                points_sel=("div", 2),
                                digits_sel=("mod", 2), NI=NI,
                                wbits=4, interpret=True)
    for i in range(NI):
        want = _oracle(psets[i // 2], dsets[i % 2])
        assert _jac_to_golden(res, i) == want, f"inst {i}"


def test_msm_instances_cpu_fallback_matches_kernel_wiring():
    """The non-Pallas fallback resolves div/mod wiring identically."""
    NI, N = 4, 8
    psets = [_gen_points(N, start=21), _gen_points(N, start=51)]
    dsets = [_scalars(N, seed=300), _scalars(N, seed=301)]
    px, py, pinf = zip(*[g1_points_to_device_arrays(p) for p in psets])
    arrays = (np.stack(px), np.stack(py), np.stack(pinf))
    slimbs = np.stack([_limbs(s) for s in dsets])
    res = msm_mod.msm_instances(CURVE, arrays, slimbs,
                                points_sel=("div", 2),
                                digits_sel=("mod", 2), NI=NI, wbits=4)
    for i in range(NI):
        want = _oracle(psets[i // 2], dsets[i % 2])
        assert _jac_to_golden(res, i) == want, f"inst {i}"
