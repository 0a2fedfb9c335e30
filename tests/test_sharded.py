"""Mesh-invariance tests for the multi-chip sharding layer.

The reference's concurrency contract is that goroutine parallelism never
changes results (reference: verify.go:152-169 BatchPar vs sequential,
consensus_specs_test.go:342-344).  The TPU analog: the same computation on
a 1-device and an 8-device virtual CPU mesh must agree —

* bit-identical for the data-parallel path (per-blob work is device-local);
* equal as group elements for the collective MSM (the all-gather fold
  changes the Jacobian representative by design), checked after host-side
  affine normalization against the pure-Python golden oracle.

Graphs are deliberately tiny (N=16, window=2, 32-bit 2-limb scalars — the
window count derives from the limb width and every window runs identical
code, so short scalars exercise the same graphs 8x faster): the 1-core
CPU XLA backend takes minutes on full-size crypto graphs.  The 8-device
shapes match __graft_entry__.dryrun_multichip exactly, sharing its
persistent-cache entries.
"""

import jax
import numpy as np
import pytest

from goethkzg_tpu.constants import P_MOD
from goethkzg_tpu.golden import curve as gcurve
from goethkzg_tpu.golden import field as gf
from goethkzg_tpu.golden.srs import insecure_srs
from goethkzg_tpu.ops.curve import CurveOps
from goethkzg_tpu.ops.field import fp_spec, fr_spec, int_to_limbs
from goethkzg_tpu.parallel import sharded
from goethkzg_tpu.serialization import g1_points_to_device_arrays

N = 16
WINDOW = 2


@pytest.fixture(scope="module")
def setup():
    _, lag, _ = insecure_srs(N, secret=1234)
    pts = g1_points_to_device_arrays(lag)
    return lag, pts


def _meshes():
    devs = jax.devices("cpu")
    return [sharded.make_mesh(devs[:1]), sharded.make_mesh(devs[:8])]


def _put(mesh, arr, shard_leading):
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P("data") if shard_leading else P()
    return jax.device_put(np.asarray(arr), NamedSharding(mesh, spec))


def _to_limbs(ints, n_limbs=16):
    arr = np.asarray(ints)
    flat = [int_to_limbs(int(v), n_limbs) for v in arr.reshape(-1)]
    return np.stack(flat).reshape(arr.shape + (n_limbs,))


def _jac_to_golden(fp, X, Y, Z):
    x, y, z = (fp.to_int(np.asarray(c)) for c in (X, Y, Z))
    if z == 0:
        return None
    zi = gf.fp_inv(z)
    zi2 = zi * zi % P_MOD
    return (x * zi2 % P_MOD, y * zi2 % P_MOD * zi % P_MOD)


def _golden_msm(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = gcurve.g1_add(acc, gcurve.g1_scalar_mul(p, int(s)))
    return acc


def test_data_parallel_commit_mesh_invariant(setup):
    lag, pts = setup
    fp = fp_spec()
    curve = CurveOps(fp)
    rng = np.random.default_rng(7)
    poly_ints = rng.integers(1, 2**31, size=(8, N), dtype=np.int64)
    polys = _to_limbs(poly_ints, n_limbs=2)

    results = []
    for mesh in _meshes():
        p = tuple(_put(mesh, a, False) for a in pts)
        out = sharded.data_parallel_commit(
            mesh, curve, p, _put(mesh, polys, True), window=WINDOW,
            to_affine=False)
        results.append(tuple(np.asarray(c) for c in out))

    # per-blob work is device-local: bit-identical across mesh shapes
    for a, b in zip(results[0], results[1]):
        np.testing.assert_array_equal(a, b)
    # and correct vs the golden oracle
    jx, jy, jz = results[1]
    for b in range(8):
        got = _jac_to_golden(fp, jx[b], jy[b], jz[b])
        assert got == _golden_msm(lag, poly_ints[b])


def test_point_sharded_msm_mesh_invariant(setup):
    lag, pts = setup
    fp = fp_spec()
    curve = CurveOps(fp)
    rng = np.random.default_rng(8)
    scalar_ints = rng.integers(1, 2**31, size=N, dtype=np.int64)
    scalars = _to_limbs(scalar_ints, n_limbs=2)

    affine = []
    for mesh in _meshes():
        p = tuple(_put(mesh, a, True) for a in pts)
        res = sharded.point_sharded_msm(mesh, curve, p,
                                        _put(mesh, scalars, True),
                                        window=WINDOW)
        affine.append(_jac_to_golden(fp, *[np.asarray(c) for c in res]))

    want = _golden_msm(lag, scalar_ints)
    assert affine[0] == want
    assert affine[1] == want


def test_point_sharded_msm_2d_host_chip_mesh(setup):
    """Hierarchical (host x chip) = (DCN x ICI) combine: a (2, 4) 2D mesh
    must equal the golden MSM (and hence the flat-mesh results above).
    32-bit 2-limb scalars keep the 1-core CPU graph small; every window
    runs identical code."""
    lag, pts = setup
    fp = fp_spec()
    curve = CurveOps(fp)
    rng = np.random.default_rng(9)
    scalar_ints = rng.integers(1, 2**31, size=N, dtype=np.int64)
    scalars = _to_limbs(scalar_ints, n_limbs=2)

    mesh = sharded.make_mesh_2d(jax.devices("cpu")[:8], n_hosts=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P(("host", "chip")))
    p = tuple(jax.device_put(np.asarray(a), shard) for a in pts)
    res = sharded.point_sharded_msm_2d(
        mesh, curve, p, jax.device_put(scalars, shard), window=WINDOW)

    got = _jac_to_golden(fp, *[np.asarray(c) for c in res])
    assert got == _golden_msm(lag, scalar_ints)


def test_domain_sharded_fft_mesh_invariant():
    """Four-step sharded NTT == single-device Domain.fft (reindexed)."""
    from goethkzg_tpu.constants import R_MOD
    from goethkzg_tpu.ops.ntt import get_domain
    fr = fr_spec()
    n1 = n2 = 8
    nn = n1 * n2
    rng = np.random.default_rng(10)
    ints = [int(x) % R_MOD for x in rng.integers(0, 1 << 62, size=nn)]
    x_mont = np.stack([fr.from_int(v) for v in ints]).reshape(n1, n2, fr.n)

    ref = np.asarray(get_domain(nn).fft(
        np.stack([fr.from_int(v) for v in ints])))

    for mesh in _meshes():
        from jax.sharding import NamedSharding, PartitionSpec as P
        xs = jax.device_put(x_mont, NamedSharding(mesh, P(None, "data")))
        y = np.asarray(sharded.domain_sharded_fft(mesh, xs, n1, n2))
        # y[k1, k2] = X_hat[k2*n1 + k1]
        for k1 in range(0, n1, 3):
            for k2 in range(0, n2, 3):
                np.testing.assert_array_equal(y[k1, k2], ref[k2 * n1 + k1])

    # inverse round-trips (including the 1/N scale): ifft(fft(x)) needs the
    # digit-reversed layout transposed back, so check via a fresh forward
    yi = np.asarray(sharded.domain_sharded_fft(
        _meshes()[1], jax.device_put(
            x_mont, NamedSharding(_meshes()[1],
                                  jax.sharding.PartitionSpec(None, "data"))),
        n1, n2, inverse=True))
    ref_i = np.asarray(get_domain(nn).ifft(
        np.stack([fr.from_int(v) for v in ints])))
    np.testing.assert_array_equal(yi[1, 2], ref_i[2 * n1 + 1])


def test_cells_sharded_proofs_mesh_invariant():
    """Sharded FK20 == single-device engine output (affine equality)."""
    from goethkzg_tpu.engines.fk20 import FK20
    from goethkzg_tpu.ops import field as field_mod

    POLY, CS = 16, 4
    mono, _, _ = insecure_srs(POLY, secret=777)
    arrays = g1_points_to_device_arrays(mono)
    fp = fp_spec()
    curve = CurveOps(fp)
    fr = fr_spec()
    with field_mod.pallas_disabled(), jax.default_device(jax.devices("cpu")[0]):
        fk = FK20(curve, arrays, poly_size=POLY, coset_size=CS)
        rng = np.random.default_rng(11)
        ints = [int(x) % fr.modulus
                for x in rng.integers(0, 1 << 62, size=POLY)]
        poly_mont = np.stack([fr.from_int(v) for v in ints])

        want = fk.multi_open_proofs(np.asarray(poly_mont)[None])
        wx, wy, winf = (np.asarray(c) for c in curve.to_affine(
            tuple(c[0] for c in want)))

        for mesh in _meshes():
            ax, ay, ainf = (np.asarray(c) for c in
                            sharded.cells_sharded_proofs(mesh, fk, poly_mont))
            np.testing.assert_array_equal(np.asarray(ainf), winf)
            for k in range(fk.num_cosets):
                if winf[k]:
                    continue
                assert fp.to_int(ax[k]) == fp.to_int(wx[k]), f"coset {k}"
                assert fp.to_int(ay[k]) == fp.to_int(wy[k]), f"coset {k}"


def test_fused_sharded_step_mesh_invariant(setup):
    """The driver-dryrun fused module (dp commits + point-sharded MSM +
    psum inner product in ONE shard_map) on 1- and 8-device meshes."""
    lag, pts = setup
    fp, fr = fp_spec(), fr_spec()
    curve = CurveOps(fp)
    rng = np.random.default_rng(12)
    poly_ints = rng.integers(1, 2**16, size=(8, N), dtype=np.int64)
    scalar_ints = rng.integers(1, 2**16, size=N, dtype=np.int64)
    a_ints = rng.integers(1, 2**16, size=N, dtype=np.int64)
    b_ints = rng.integers(1, 2**16, size=N, dtype=np.int64)
    polys = _to_limbs(poly_ints, n_limbs=1)
    scalars = _to_limbs(scalar_ints, n_limbs=1)
    a_mont = np.stack([fr.from_int(int(v)) for v in a_ints])
    b_mont = np.stack([fr.from_int(int(v)) for v in b_ints])

    want_dp = [_golden_msm(lag, poly_ints[b]) for b in range(8)]
    want_msm = _golden_msm(lag, scalar_ints)
    want_ip = sum(int(a) * int(b)
                  for a, b in zip(a_ints, b_ints)) % fr.modulus

    for mesh in _meshes():
        ndev = mesh.devices.size
        p = tuple(_put(mesh, a, False) for a in pts)
        res, ip = sharded.fused_sharded_step(
            mesh, curve, p, _put(mesh, polys, True),
            _put(mesh, scalars, True), _put(mesh, a_mont, True),
            _put(mesh, b_mont, True), window=1)
        rx, ry, rz = (np.asarray(c) for c in res)
        per_dev = rx.shape[0] // ndev
        for b in range(8):
            dev, off = divmod(b, per_dev - 1)
            row = dev * per_dev + off
            got = _jac_to_golden(fp, rx[row], ry[row], rz[row])
            assert got == want_dp[b], f"mesh {ndev} blob {b}"
        for d in range(ndev):
            row = d * per_dev + (per_dev - 1)
            got = _jac_to_golden(fp, rx[row], ry[row], rz[row])
            assert got == want_msm, f"mesh {ndev} device {d}"
        assert fr.to_int(np.asarray(ip)) == want_ip


def test_domain_sharded_inner_product_mesh_invariant():
    fr = fr_spec()
    rng = np.random.default_rng(9)
    a_ints = rng.integers(1, 2**63, size=N, dtype=np.int64)
    b_ints = rng.integers(1, 2**63, size=N, dtype=np.int64)
    a_mont = np.stack([fr.from_int(int(v)) for v in a_ints])
    b_mont = np.stack([fr.from_int(int(v)) for v in b_ints])

    outs = []
    for mesh in _meshes():
        out = sharded.domain_sharded_inner_product(
            mesh, _put(mesh, a_mont, True), _put(mesh, b_mont, True))
        outs.append(fr.to_int(np.asarray(out)))

    want = sum(int(a) * int(b) for a, b in zip(a_ints, b_ints)) % fr.modulus
    assert outs[0] == want
    assert outs[1] == want
