"""Per-kernel speed-of-light table (BASELINE.md north-star instrumentation).

Measures the hot kernels' achieved throughput on the real chip and
compares each against a documented hardware ceiling, printing a markdown
table (paste into PERF.md).

    cd /root/repo && nohup python tools/sol_bench.py > /tmp/sol.log 2>&1 &

Ceilings (TPU v5e, 1 chip):
* VPU: 8x128 vector lanes x 4 ALUs x ~1.74 GHz ~= 7.1e12 int32 ops/s.
  The 16-limb Montgomery mul costs ~1100 VPU ops (banded 16x16 u16
  convolution as 256 i32 MACs counted as 512 ops, plus ~64 reduction
  rows and Kogge-Stone carry fixups) -> SOL ~= 6.5e9 Fr muls/s.
* HBM: ~819 GB/s.  The table-MSM kernel streams the digit table once
  per batch: SOL_time >= bytes_streamed / 819e9.
All kernels here are VPU-bound integer code (the MXU does not help
modular bignum), so VPU SOL is the honest ceiling.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VPU_INT_OPS = 7.1e12          # int32 lane-ops/s, v5e
HBM_BPS = 819e9

MONT_MUL_OPS = 1100           # VPU lane-ops per 16-limb Montgomery mul
ADD_MIXED_MULS = 11           # RCB complete mixed add
ADD_FULL_MULS = 12


def _t(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goethkzg_tpu.ops import pallas_field
    from goethkzg_tpu.ops.field import fr_spec

    assert jax.default_backend() == "tpu", jax.default_backend()
    fr = fr_spec()
    rows = []

    def add_row(name, unit, achieved, sol, note):
        rows.append((name, unit, achieved, sol, note))

    # ---- mont_mul -------------------------------------------------------
    LANES = 1 << 20
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (LANES, fr.n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (LANES, fr.n), dtype=np.uint32))

    mul = jax.jit(lambda x, y: pallas_field.mont_mul(fr, x, y))
    dt = _t(lambda: mul(a, b).block_until_ready())
    achieved = LANES / dt
    add_row("pallas mont_mul (Fr)", "muls/s", achieved,
            VPU_INT_OPS / MONT_MUL_OPS,
            f"{LANES} lanes, {dt*1e3:.2f} ms")

    # ---- fixed-base table MSM (commit kernel) ---------------------------
    from goethkzg_tpu.api import new_context_4096_secure
    from goethkzg_tpu.ops import msm as msm_mod

    ctx = new_context_4096_secure()
    B = 64
    polys = rng.integers(0, 2**16, size=(B, 4096, 16), dtype=np.uint32)
    polys[..., -1] &= 0x7FFF
    polys = jnp.asarray(polys)
    tx, ty = ctx.commit_table

    fn = jax.jit(lambda s: msm_mod.msm_fixed_base(ctx.curve, (tx, ty), s,
                                                  wbits=4))
    dt = _t(lambda: fn(polys)[0].block_until_ready())
    nadds = B * 4096 * (256 // 4)         # one mixed add per (point, window)
    # SOL: each mixed add = 11 mont muls of VPU cost, plus table stream
    sol_compute = VPU_INT_OPS / (ADD_MIXED_MULS * MONT_MUL_OPS)
    table_bytes = int(tx.size + ty.size) * 4
    add_row("table-MSM commit kernel", "mixed adds/s", nadds / dt,
            sol_compute,
            f"B={B}, {dt*1e3:.1f} ms; table stream floor "
            f"{table_bytes/HBM_BPS*1e3:.1f} ms")
    add_row("blob commit (kernel only)", "blobs/s", B / dt, float("nan"),
            "")

    # ---- Fr NTT 8192 ----------------------------------------------------
    from goethkzg_tpu.ops.ntt import get_domain
    dom = get_domain(8192)
    x = jnp.asarray(rng.integers(0, 1 << 16, (B, 8192, fr.n),
                                 dtype=np.uint32))
    fftf = jax.jit(dom.fft)
    dt = _t(lambda: fftf(x).block_until_ready())
    nmul = B * 8192 * 13 // 2             # N/2 log N butterfly muls
    add_row("Fr NTT 8192 (batched)", "NTTs/s", B / dt,
            VPU_INT_OPS / MONT_MUL_OPS / (8192 * 13 // 2),
            f"B={B}, {dt*1e3:.1f} ms; {nmul/dt:.3e} butterfly-muls/s")

    # ---- host native pairing -------------------------------------------
    from goethkzg_tpu import hostcurve
    from goethkzg_tpu.golden import curve as gc
    g1 = gc.g1_generator()
    g2 = gc.g2_generator()
    neg_g1 = gc.g1_neg(g1)
    dt = _t(lambda: hostcurve.pairing_check([(g1, g2), (neg_g1, g2)]), reps=3)
    add_row("pairing check (native host)", "s/call", dt, float("nan"),
            "2-pairing product, C++ Miller loop")

    print("| kernel | achieved | unit | speed-of-light | % SOL | note |")
    print("|---|---|---|---|---|---|")
    out = {}
    for name, unit, ach, sol, note in rows:
        pct = f"{100*ach/sol:.1f}%" if sol == sol and sol > 0 else "-"
        sols = f"{sol:.3e}" if sol == sol else "-"
        print(f"| {name} | {ach:.3e} | {unit} | {sols} | {pct} | {note} |")
        out[name] = {"achieved": ach, "unit": unit,
                     "sol": None if sol != sol else sol, "note": note}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
