"""Tiny real-TPU smoke of every Pallas kernel entry point.

Catches Mosaic lowering failures (block-shape legality, VMEM limits) that
interpret-mode tests cannot see, in seconds instead of a full bench run.
Run on the chip:  python tools/smoke_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu.golden.srs import insecure_srs
    from goethkzg_tpu.ops.curve import CurveOps
    from goethkzg_tpu.ops.field import fp_spec, int_to_limbs
    from goethkzg_tpu.ops import msm as msm_mod
    from goethkzg_tpu.ops import proj
    from goethkzg_tpu.serialization import g1_points_to_device_arrays
    from goethkzg_tpu.golden import curve as gcurve

    assert jax.default_backend() == "tpu", jax.devices()
    print(f"devices: {jax.devices()}", flush=True)

    FP = fp_spec()
    curve = CurveOps(FP)
    N = 256
    _, lag, _ = insecure_srs(N, secret=4321)
    px, py, pinf = (jnp.asarray(a) for a in g1_points_to_device_arrays(lag))
    rng = np.random.default_rng(7)
    B = 4
    sc_ints = rng.integers(1, 2**63, size=(B, N), dtype=np.uint64)
    sc = jnp.asarray(np.stack(
        [[int_to_limbs(int(v), 16) for v in row] for row in sc_ints]))

    def golden(b):
        acc = None
        for p, s in zip(lag, sc_ints[b]):
            acc = gcurve.g1_add(acc, gcurve.g1_scalar_mul(p, int(s)))
        return acc

    def check(name, res, t):
        ax, ay, ainf = jax.jit(curve.to_affine)(res)
        ax, ay, ainf = np.asarray(ax), np.asarray(ay), np.asarray(ainf)
        for b in range(B):
            want = golden(b)
            got = None if ainf[b] else (FP.to_int(ax[b]), FP.to_int(ay[b]))
            assert got == want, f"{name} b={b}: {got} != {want}"
        print(f"ok  {name}  ({t:.2f}s)", flush=True)

    # 1. fused bucket MSM (round 1, pallas_msm.py)
    t0 = time.time()
    res = jax.block_until_ready(jax.jit(
        lambda s: msm_mod.msm_batched(curve, (px, py, pinf), s,
                                      shared_points=True))(sc))
    check("bucket_msm", res, time.time() - t0)

    # 2. fixed-base table MSM (pallas_tablemsm.py)
    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    t0 = time.time()
    table = ptm.build_table_device(curve, (px, py, pinf), wbits=4)
    res = jax.block_until_ready(jax.jit(
        lambda s: msm_mod.msm_fixed_base(curve, table, s, wbits=4))(sc))
    check("table_msm_w4", res, time.time() - t0)

    # 3. per-instance bucket MSM (pallas_msm2.py)
    t0 = time.time()
    pts = (jnp.broadcast_to(px, (B,) + px.shape),
           jnp.broadcast_to(py, (B,) + py.shape),
           jnp.broadcast_to(pinf, (B,) + pinf.shape))
    res = jax.block_until_ready(jax.jit(
        lambda p, s: msm_mod.msm_instances(curve, p, s, NI=B))(pts, sc))
    check("instance_msm", res, time.time() - t0)

    # 4. device G1 wire decode (ops/decompress.py)
    from goethkzg_tpu.ops.decompress import DeviceG1Decoder
    t0 = time.time()
    enc = [gcurve.g1_compress(p) for p in lag]
    d = DeviceG1Decoder(curve)
    x, y, inf, ok = d.decode(enc, subgroup_check=True)
    assert np.asarray(ok).all()
    print(f"ok  device_decode  ({time.time() - t0:.2f}s)", flush=True)

    print("ALL SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
