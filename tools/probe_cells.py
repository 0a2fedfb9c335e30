"""Per-stage timing of compute_cells_and_kzg_proofs (the cells prover).

e2e measured 1.56 s/blob (r4) against a ~200 ms gnark single-core
reference — but the total device WORK is only ~6 M Fp muls (~45 ms at
the measured 139 Mmul/s), so the path is structure/latency-bound.  This
splits it:

  coeffs      blob -> monomial coefficients (brp + 4096 iNTT)
  extevals    pad + 8192 NTT + brp + partition (the cells themselves)
  toeplitz    circulant gather + 64x128 batched NTT -> stage-1 scalars
  stage1      fixed-base table MSM (128 lanes x 4096 pairs)
  stage2      h_ext affine + composite 65-column MSM (pallas_msm2)
  proofs_full multi_open_proofs end-to-end
  serialize   host: cells + proofs -> wire bytes
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.timing import measure, measure_host

def main():
    import jax
    import jax.numpy as jnp
    from goethkzg_tpu import serialization
    from goethkzg_tpu.api import Context
    from goethkzg_tpu.constants import R_MOD

    print(f"devices: {jax.devices()}", flush=True)
    ctx = Context()
    fk = ctx.fk20
    fr = ctx.fr
    rng = np.random.default_rng(0)

    def rand_blob():
        out = bytearray()
        for _ in range(4096):
            out += (int.from_bytes(rng.bytes(32), "big")
                    % R_MOD).to_bytes(32, "big")
        return bytes(out)

    blob = rand_blob()
    rows = []

    def rec(name, seconds, note=""):
        rows.append((name, seconds))
        print(f"  {name:18s} {seconds * 1e3:9.2f} ms  {note}", flush=True)

    # warm the full op once (compiles ride the cache)
    ctx.compute_cells_and_kzg_proofs(blob)
    print("warm", flush=True)

    t = measure_host(lambda: ctx.compute_cells_and_kzg_proofs(blob))
    rec("e2e", t, "bytes in -> bytes out")

    poly = serialization.deserialize_blob(blob)
    to_coeffs = jax.jit(ctx._coeffs_fn())
    t = measure(lambda: to_coeffs(jnp.asarray(poly)))
    rec("coeffs", t, "brp + iNTT 4096")
    coeffs = to_coeffs(jnp.asarray(poly))

    f = jax.jit(lambda c: fk.extended_evaluations(c))
    t = measure(lambda: f(coeffs))
    rec("extevals", t, "pad + NTT 8192 + brp")

    f2 = jax.jit(lambda c: fk._toeplitz_scalars(c))
    t = measure(lambda: f2(coeffs))
    rec("toeplitz", t, "64 x 128-NTT scalars")
    scalars = f2(coeffs)

    from goethkzg_tpu.ops import pallas_tablemsm as ptm
    F = ctx.curve.F

    def s1(sc):
        packed = ptm.pack_digits_outputs(sc, wbits=4)
        return ptm.table_msm(F, fk.s1_table, packed)

    f3 = jax.jit(s1)
    t = measure(lambda: f3(scalars))
    rec("stage1", t, "fixed-base table MSM, 128 lanes")

    f4 = jax.jit(lambda c: fk.multi_open_proofs(c))
    t = measure(lambda: f4(coeffs))
    rec("proofs_full", t, "stage1 + affine + stage2")

    run = ctx._jit("cells_proofs_coeffs", ctx._cells_proofs_from_coeffs_fn)
    evals, (ax, ay, ainf) = run(coeffs)
    evals_h = np.asarray(evals)
    axh, ayh, ainfh = (np.asarray(a) for a in (ax, ay, ainf))
    t = measure_host(lambda: (ctx._serialize_cells(evals_h),
                              ctx._serialize_proofs(axh, ayh, ainfh)))
    rec("serialize", t, "host wire bytes")

    print("\n| stage | ms |")
    print("|---|---|")
    for name, s in rows:
        print(f"| {name} | {s * 1e3:.2f} |")


if __name__ == "__main__":
    main()
