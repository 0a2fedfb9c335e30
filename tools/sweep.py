"""Kernel-config sweep on the real chip — data for the commit-path ladder.

Round-2 analysis (PERF.md): the commit MSM is op-count-bound, not
schedule-bound — the implemented Montgomery mul costs ~13.5k VPU lane-ops
(three banded convolutions + Kogge-Stone carries), not the ~2.4k of the
naive SOL model, so the honest ceiling depends on the ACHIEVED lane-op
rate.  This sweep measures, on one chip:

  1. raw pallas mont_mul throughput (Fp, n=24) -> the real lane-op rate;
  2. fixed-base table MSM (ops/pallas_tablemsm.py) wbits=4 vs wbits=8 and
     accumulator-rows TB in {16, 32, 64} — wbits=8 halves the point-add
     count for an 8x bigger (3.2 GB) streamed table;
  3. the round-1 fused bucket kernel on the same 64-blob batch (baseline);
  4. the device wire-decode graph (ops/decompress.py) at 128/256 points.

Each config is one warm-up (compile) + min-of-3 timed reps.  Select
stages with SWEEP=raw,table4,table8,bucket,decode (default: all).
Prints one JSON line per result and a final markdown table for PERF.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.timing import measure as _time   # fetch-synced (timing.py)

BATCH = 64


def _emit(rows, name, seconds, unit_count, unit):
    rate = unit_count / seconds
    row = {"config": name, "seconds": round(seconds, 4),
           "rate": round(rate, 1), "unit": unit}
    rows.append(row)
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu.api import Context
    from goethkzg_tpu.ops.field import fp_spec

    stages = set(os.environ.get(
        "SWEEP", "raw,mxu,table4,table8,bucket,decode").split(","))
    rows = []
    print(f"devices: {jax.devices()}", flush=True)

    # ---- 1. raw mont mul rate ------------------------------------------
    if "raw" in stages:
        from goethkzg_tpu.ops import pallas_field
        F = fp_spec()
        rng = np.random.default_rng(0)
        LANES = 1 << 17
        a = jnp.asarray(rng.integers(0, 1 << 16, (LANES, F.n), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (LANES, F.n), dtype=np.uint32))

        @jax.jit
        def chain(a, b):
            x = a
            for _ in range(8):          # 8 dependent muls amortize dispatch
                x = F.mul(x, b)
            return x

        t = _time(lambda: chain(a, b))
        _emit(rows, "raw_mont_mul_fp", t, 8 * LANES, "muls/s")

    ctx = Context()
    rng = np.random.default_rng(1)
    from goethkzg_tpu.constants import R_MOD

    def rand_blob():
        out = bytearray()
        for _ in range(4096):
            out += (int.from_bytes(rng.bytes(32), "big")
                    % R_MOD).to_bytes(32, "big")
        return bytes(out)

    blobs = [rand_blob() for _ in range(BATCH)]
    # scalars normal-form limbs [B, 4096, 16]
    from goethkzg_tpu import serialization
    scal = np.stack([serialization.deserialize_blob(b) for b in blobs])

    # ---- 2. table MSM configs ------------------------------------------
    def run_table(wbits, TB):
        import jax
        from goethkzg_tpu.ops import pallas_tablemsm as ptm
        from goethkzg_tpu.ops import proj
        table = ptm.build_table_device(
            ctx.curve, ctx.lagrange_brp, wbits=wbits,
            windows_per_slice=1 if wbits >= 8 else 4)

        @jax.jit
        def commit(tx, ty, sc):
            packed = ptm.pack_digits_lanes(sc, wbits=wbits)
            res = ptm.table_msm(ctx.curve.F, (tx, ty), packed, TB=TB)
            return proj.tree_add(ctx.curve.F, res, axis_from_end=0)

        sc = jnp.asarray(scal)
        tx, ty = table
        t = _time(lambda: commit(tx, ty, sc))
        _emit(rows, f"table_msm_w{wbits}_TB{TB}", t, BATCH, "blobs/s")
        del table

    if "table4" in stages:
        for TB in (16, 32, 64):
            run_table(4, TB)
    if "table8" in stages:
        for TB in (16, 32):
            run_table(8, TB)

    # ---- 2b. MXU-conv mont mul vs the VPU-only kernel -------------------
    if "mxu" in stages:
        from goethkzg_tpu.ops.pallas_mxu import mont_mul_mxu
        F = fp_spec()
        rng2 = np.random.default_rng(5)
        LANES = 1 << 17
        a = jnp.asarray(rng2.integers(0, 1 << 16, (LANES, F.n),
                                      dtype=np.uint32))
        b = jnp.asarray(rng2.integers(0, 1 << 16, (LANES, F.n),
                                      dtype=np.uint32))

        @jax.jit
        def chain_mxu(a, b):
            x = a
            for _ in range(8):
                x = mont_mul_mxu(F, x, b)
            return x

        t = _time(lambda: chain_mxu(a, b))
        _emit(rows, "mxu_mont_mul_fp", t, 8 * LANES, "muls/s")

    # ---- 2c. RNS Montgomery mul (MXU base extensions) -------------------
    if "rns" in stages:
        from goethkzg_tpu.ops.rns import fp_rns
        from goethkzg_tpu.ops.rns_jax import RNSOps
        rops = RNSOps(fp_rns())
        rngr = np.random.default_rng(9)
        LANES = 1 << 17
        # canonical residues < modulus
        xr = jnp.asarray(rngr.integers(0, 1 << 14, (LANES, rops.n_res),
                                       dtype=np.uint32))
        yr = jnp.asarray(rngr.integers(0, 1 << 14, (LANES, rops.n_res),
                                       dtype=np.uint32))

        @jax.jit
        def chain_rns(a, b):
            x = a
            for _ in range(8):
                x = rops.mul(x, b)
            return x

        # vary inputs per rep ON DEVICE (a host-side perturbation
        # re-uploads 29 MB through the tunnel per rep and times the wire,
        # not the kernel — the r5 sweep's first 3.4 Mmul/s reading)
        def run_rns(i=[0]):
            i[0] += 1
            return chain_rns(xr + np.uint32(i[0] % 7), yr)

        t = _time(run_rns)
        _emit(rows, "rns_mont_mul_fp", t, 8 * LANES, "muls/s")

    # ---- 2d. Pallas RNS mul kernel (VMEM-resident, round 5) -------------
    if "prns" in stages:
      try:
        from goethkzg_tpu.ops.pallas_rns import mont_mul_rns
        from goethkzg_tpu.ops.rns import fp_rns
        spec = fp_rns()
        rngp = np.random.default_rng(13)
        LANES = 1 << 17
        DEPTH = 16
        m_all = np.array(spec.A.m + spec.B.m, dtype=np.uint32)
        xr = (rngp.integers(0, 1 << 30, (LANES, 2 * spec.k))
              % m_all).astype(np.uint32)
        yr = (rngp.integers(0, 1 << 30, (LANES, 2 * spec.k))
              % m_all).astype(np.uint32)
        xj, yj = jnp.asarray(xr), jnp.asarray(yr)
        for name, mxu in (("mxu", True), ("vpu", False)):
            fn = jax.jit(lambda a, b, mxu=mxu: mont_mul_rns(
                spec, a, b, depth=DEPTH, mxu=mxu))

            # perturb ON DEVICE (host perturbation re-uploads 29 MB/rep)
            def run_prns(i=[0]):
                i[0] += 1
                return fn(xj + np.uint32(i[0] % 5), yj)

            t = _time(run_prns)
            _emit(rows, f"pallas_rns_mul_{name}_d{DEPTH}", t,
                  DEPTH * LANES, "muls/s")
      except Exception as e:            # noqa: BLE001 — record, keep going
        print(f"prns FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)

    # ---- 2e. Pallas RNS fixed-base table MSM (round 5) ------------------
    if "ptable" in stages:
      try:
        from goethkzg_tpu.ops import msm as msm_mod2
        from goethkzg_tpu.ops import pallas_rns, pallas_tablemsm as ptm
        from goethkzg_tpu.ops.rns import fp_rns
        from goethkzg_tpu.ops.rns_jax import RNSOps
        rops2 = RNSOps(fp_rns())
        for wbits in (8,):
            table = ptm.build_table_device(
                ctx.curve, ctx.lagrange_brp, wbits=wbits,
                windows_per_slice=1 if wbits >= 8 else 4)
            trns = pallas_rns.build_rns_table(rops2, table[0], table[1])
            del table
            sc = jnp.asarray(scal)

            @jax.jit
            def commit_rns(tx, ty, s):
                return msm_mod2.msm_fixed_base_rns(
                    ctx.curve, (tx, ty), s, wbits=wbits)

            tx, ty = trns
            t = _time(lambda: commit_rns(tx, ty, sc))
            _emit(rows, f"rns_table_msm_w{wbits}", t, BATCH, "blobs/s")
            # kernel-only split (no lane tree-add / CRT tail); the 3-D
            # row-vectorized kernel is VPU-extension only
            @jax.jit
            def kernel_only(tx, ty, s):
                packed = ptm.pack_digits_lanes(s, wbits=wbits)
                return pallas_rns.rns_table_msm(fp_rns(), (tx, ty), packed)

            t = _time(lambda: kernel_only(tx, ty, sc))
            _emit(rows, f"rns_table_kernel_w{wbits}", t, BATCH, "blobs/s")
            del trns
      except Exception as e:            # noqa: BLE001 — record, keep going
        print(f"ptable FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)

    # ---- 3. round-1 fused bucket kernel --------------------------------
    if "bucket" in stages:
        import jax
        from goethkzg_tpu.ops import msm as msm_mod

        @jax.jit
        def commit_bucket(sc):
            return msm_mod.msm_batched(ctx.curve, ctx.lagrange_brp, sc,
                                       shared_points=True)

        sc = jnp.asarray(scal)
        t = _time(lambda: commit_bucket(sc))
        _emit(rows, "bucket_msm_w8", t, BATCH, "blobs/s")

    # ---- 4. device wire decode -----------------------------------------
    if "decode" in stages:
        from goethkzg_tpu.ops.decompress import DeviceG1Decoder
        from goethkzg_tpu.golden import curve as gc
        g = gc.g1_generator()
        pts = [g]
        for _ in range(255):
            pts.append(gc.g1_add(pts[-1], g))
        enc = [gc.g1_compress(p) for p in pts]
        d = DeviceG1Decoder(ctx.curve)
        for B in (128, 256):
            t = _time(lambda: np.asarray(
                d.decode(enc[:B], subgroup_check=True)[3]), warmup=1)
            _emit(rows, f"device_decode_{B}", t, B, "points/s")

    print("\n| config | seconds | rate |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['seconds']} | {r['rate']} {r['unit']} |")


if __name__ == "__main__":
    main()
