"""G1 group-FFT differential tests vs the golden DFT.

The TPU G1 FFT (ops/g1fft.py) replaces the reference's recursive
Cooley-Tukey with per-butterfly scalar mults (internal/domain/fft.go:19-92);
these tests pin it to the naive sum-of-scalar-mults DFT and check the
FFT/IFFT round trip, on tiny domains on the CPU backend.
"""

import random

import jax
import numpy as np

from goethkzg_tpu.constants import R_MOD
from goethkzg_tpu.golden import curve as gc
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec
from goethkzg_tpu.ops.g1fft import G1FFT
from goethkzg_tpu.ops.ntt import root_of_unity
from goethkzg_tpu.serialization import g1_points_to_device_arrays

CPU = jax.devices("cpu")[0]
N = 4


def _points(seed=8, with_inf=True):
    _, lag, _ = insecure_srs(N, secret=99)
    pts = list(lag)
    if with_inf:
        pts[2] = None
    return pts


def _to_device(pts, curve):
    px, py, pinf = (jax.device_put(a, CPU)
                    for a in g1_points_to_device_arrays(pts))
    return curve.from_affine(px, py, pinf)


def _from_device(curve, jac):
    fp = curve.F
    ax, ay, ainf = (np.asarray(a) for a in jax.jit(curve.to_affine)(jac))
    out = []
    for i in range(ax.shape[0]):
        out.append(None if bool(ainf[i])
                   else (fp.to_int(ax[i]), fp.to_int(ay[i])))
    return out


def _golden_dft(pts, g):
    out = []
    for k in range(N):
        acc = None
        for i, p in enumerate(pts):
            if p is None:
                continue
            acc = gc.g1_add(acc, gc.g1_scalar_mul(p, pow(g, i * k, R_MOD)))
        out.append(acc)
    return out


def test_g1_fft_matches_golden_dft_and_roundtrips():
    curve = CurveOps(fp_spec())
    fft = G1FFT(curve, N)
    pts = _points()
    g = root_of_unity(N)
    with jax.default_device(CPU):
        jac = _to_device(pts, curve)
        fwd = jax.jit(fft.fft)(jac)
        back = jax.jit(fft.ifft)(fwd)
    assert _from_device(curve, fwd) == _golden_dft(pts, g)
    assert _from_device(curve, back) == pts


import pytest as _pytest


@_pytest.fixture(autouse=True)
def _jnp_field_path():
    """These tests trace for the CPU backend: keep the jnp field path."""
    from goethkzg_tpu.ops import field as _field
    with _field.pallas_disabled():
        yield
