"""MSM differential tests: Pippenger vs the schoolbook oracle.

Mirrors the reference's MSM-vs-slowMultiExp test
(internal/multiexp/multiexp_test.go:13-35), plus TPU-specific cases the
branchless formulation must handle: zero scalars, repeated points (bucket
doubling), points at infinity, and chunked-vs-unchunked equality.

Runs on the CPU backend with tiny sizes so it is always exercised.
"""

import random

import jax
import numpy as np
import pytest

from goethkzg_tpu.constants import R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops import msm as msm_mod
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec, int_to_limbs
from goethkzg_tpu.serialization import g1_points_to_device_arrays

CPU = jax.devices("cpu")[0]


def _setup(n, seed=5, with_inf=False):
    _, lag, _ = insecure_srs(n, secret=4321)
    pts = list(lag)
    if with_inf:
        pts[1] = None
    rng = random.Random(seed)
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[0] = 0                      # zero scalar
    if n >= 4:
        pts[3] = pts[2]                 # duplicate point -> bucket doubling
        scalars[3] = scalars[2]         # same digit pattern too
    px, py, pinf = g1_points_to_device_arrays(pts)
    slimbs = np.stack([int_to_limbs(s, 16) for s in scalars])
    return pts, scalars, (px, py, pinf), slimbs


def _golden_msm(pts, scalars):
    acc = None
    for p, s in zip(pts, scalars):
        if p is None or s == 0:
            continue
        acc = gc.g1_add(acc, gc.g1_scalar_mul(p, s))
    return acc


def _run_device_msm(arrays, slimbs, window, chunks):
    fp = fp_spec()
    curve = CurveOps(fp)
    with jax.default_device(CPU):
        res = jax.jit(lambda p, s: curve.to_affine(tuple(
            c[None] for c in msm_mod.msm(curve, p, s, window=window,
                                         chunks=chunks))))(
            tuple(jax.device_put(a, CPU) for a in arrays),
            jax.device_put(slimbs, CPU))
    ax, ay, ainf = (np.asarray(a) for a in res)
    if bool(ainf[0]):
        return None
    return (fp.to_int(ax[0]), fp.to_int(ay[0]))


@pytest.mark.parametrize("window,chunks", [(4, 1), (4, 2), (8, 1)])
def test_msm_matches_golden(window, chunks):
    pts, scalars, arrays, slimbs = _setup(8)
    assert _run_device_msm(arrays, slimbs, window, chunks) == \
        _golden_msm(pts, scalars)


def test_msm_with_infinity_points():
    pts, scalars, arrays, slimbs = _setup(8, seed=6, with_inf=True)
    assert _run_device_msm(arrays, slimbs, 4, 2) == _golden_msm(pts, scalars)


def test_msm_all_zero_scalars_is_infinity():
    pts, _, arrays, _ = _setup(4)
    slimbs = np.zeros((4, 16), dtype=np.uint32)
    assert _run_device_msm(arrays, slimbs, 4, 1) is None


import pytest as _pytest


@_pytest.fixture(autouse=True)
def _jnp_field_path():
    """These tests trace for the CPU backend: keep the jnp field path."""
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled():
        yield
