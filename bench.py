"""Headline benchmark: batched blob_to_kzg_commitment throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against gnark-crypto's single-core throughput for the
same op.  The reference publishes no absolute numbers (BASELINE.md); we use
a documented estimate of ~2.5 ms per 4096-point MSM commit on a modern
x86 core (gnark-crypto published Pippenger benchmarks), i.e. ~400 blobs/s.
"""

import json
import time

import jax.numpy as jnp
import numpy as np

GNARK_SINGLE_CORE_COMMITS_PER_S_EST = 400.0
BATCH = 64
REPS = 3


def main():
    from goethkzg_tpu.api import new_context_4096_secure
    from goethkzg_tpu.ops import msm as msm_mod
    import jax

    ctx = new_context_4096_secure()
    curve = ctx.curve
    points = ctx.lagrange_brp

    @jax.jit
    def commit(px, py, pinf, polys):
        res = msm_mod.msm_batched(curve, (px, py, pinf), polys,
                                  shared_points=True)
        return curve.to_affine(res)

    rng = np.random.default_rng(0)
    polys = rng.integers(0, 2**16, size=(BATCH, 4096, 16), dtype=np.uint32)
    polys[..., -1] &= 0x7FFF
    polys = jnp.asarray(polys)

    # warmup / compile
    out = commit(points[0], points[1], points[2], polys)
    out[0].block_until_ready()

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = commit(points[0], points[1], points[2], polys)
        out[0].block_until_ready()
        best = min(best, time.perf_counter() - t0)

    blobs_per_s = BATCH / best
    print(json.dumps({
        "metric": "blob_to_kzg_commitment_throughput",
        "value": round(blobs_per_s, 2),
        "unit": f"blobs/s (batch={BATCH}, 1 chip)",
        "vs_baseline": round(blobs_per_s / GNARK_SINGLE_CORE_COMMITS_PER_S_EST, 3),
    }))


if __name__ == "__main__":
    main()
