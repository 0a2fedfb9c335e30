"""Headline benchmarks on one chip, end-to-end at the bytes API.

Prints ONE JSON line.  The primary metric stays blob commit throughput
(comparable across rounds); the BASELINE.md north-star verify metrics and
the cells prover ride along in "extra".

vs_baseline compares against gnark-crypto single-core estimates (the
reference publishes no absolute numbers — BASELINE.md):
  * commit: ~2.5 ms / 4096-pt fixed-base MSM  -> ~400 blobs/s
  * verify_blob_batch(64): ~1.5 ms/blob amortised (RLC fold: 3 64-pt MSMs
    + per-blob 4096-mul barycentric eval + 1 pairing)  -> ~650 blobs/s
  * verify_cell_batch(128): ~25 ms / 128 cells  -> ~5000 cells/s
  * compute_cells_and_kzg_proofs: ~200 ms / blob  -> ~5 blobs/s

Each op is timed as min over REPS of full wall time (bytes in, bytes out),
after one untimed warmup that triggers compilation.
"""

import json
import secrets
import time

BATCH = 64
CELL_BATCH = 128       # one extended blob's worth of cells
REPS = 3

BASE = {
    "commit": 400.0,            # blobs/s, single gnark core
    "verify_blob": 650.0,       # blobs/s
    "verify_cell": 5000.0,      # cells/s
    "cells_proofs": 5.0,        # blobs/s
}


def _rand_blob(rng):
    import numpy as np
    from goethkzg_tpu.constants import R_MOD
    out = bytearray()
    for _ in range(4096):
        out += (int.from_bytes(rng.bytes(32), "big") % R_MOD).to_bytes(32, "big")
    return bytes(out)


def _time(fn):
    fn()                                 # warmup / compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import numpy as np
    from goethkzg_tpu.api import Context

    ctx = Context()

    class _Rng:
        def __init__(self, seed):
            self._r = np.random.default_rng(seed)

        def bytes(self, k):
            return self._r.bytes(k)

    rng = _Rng(0)
    blobs = [_rand_blob(rng) for _ in range(BATCH)]

    # ---- commit throughput -------------------------------------------------
    t_commit = _time(lambda: ctx.blob_to_kzg_commitment_batch(blobs))
    commits = ctx.blob_to_kzg_commitment_batch(blobs)

    # ---- verify_blob_kzg_proof_batch --------------------------------------
    proofs = [ctx.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, commits)]
    t_vblob = _time(
        lambda: ctx.verify_blob_kzg_proof_batch(blobs, commits, proofs))

    # ---- compute_cells_and_kzg_proofs + verify_cell_kzg_proof_batch -------
    t_cells = _time(lambda: ctx.compute_cells_and_kzg_proofs(blobs[0]))
    cells, cell_proofs = ctx.compute_cells_and_kzg_proofs(blobs[0])
    idxs = list(range(CELL_BATCH))
    comms = [commits[0]] * CELL_BATCH
    t_vcell = _time(lambda: ctx.verify_cell_kzg_proof_batch(
        comms, idxs, cells, cell_proofs))

    commit_tp = BATCH / t_commit
    vblob_tp = BATCH / t_vblob
    vcell_tp = CELL_BATCH / t_vcell
    cells_tp = 1.0 / t_cells

    print(json.dumps({
        "metric": "blob_to_kzg_commitment_throughput",
        "value": round(commit_tp, 2),
        "unit": f"blobs/s (batch={BATCH}, 1 chip)",
        "vs_baseline": round(commit_tp / BASE["commit"], 3),
        "extra": {
            "verify_blob_kzg_proof_batch": {
                "value": round(vblob_tp, 2),
                "unit": f"blobs/s (batch={BATCH})",
                "vs_baseline": round(vblob_tp / BASE["verify_blob"], 3)},
            "verify_cell_kzg_proof_batch": {
                "value": round(vcell_tp, 2),
                "unit": f"cells/s (batch={CELL_BATCH})",
                "vs_baseline": round(vcell_tp / BASE["verify_cell"], 3)},
            "compute_cells_and_kzg_proofs": {
                "value": round(cells_tp, 2),
                "unit": "blobs/s (batch=1)",
                "vs_baseline": round(cells_tp / BASE["cells_proofs"], 3)},
        },
    }))


if __name__ == "__main__":
    main()
