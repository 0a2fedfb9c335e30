"""Prime the persistent XLA compile cache for every bench/driver shape.

VERDICT r03: bench.py lost 2 of its 4 metrics because the cells and
cell-verify graphs compiled cold INSIDE the 420 s bench budget (measured
1,090 s + 443 s of compile for those two shapes).  This tool walks every
(operation, padded-batch) shape that bench.py and tools/drive_e2e.py
exercise and runs each once, so their executables land in the repo-local
persistent cache (data/cache/jax) and the bench budget is pure
measurement.

Run after any kernel/graph change:  python tools/prime_cache.py
Idempotent; safe to re-run (warm shapes load in milliseconds).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    from goethkzg_tpu.api import Context
    from goethkzg_tpu.constants import R_MOD

    ctx = Context()
    log("Context built")
    _ = ctx.commit_table
    log("commit table ready")

    rng = np.random.default_rng(0)

    def rand_blob():
        out = bytearray()
        for _ in range(4096):
            out += (int.from_bytes(rng.bytes(32), "big")
                    % R_MOD).to_bytes(32, "big")
        return bytes(out)

    # bench.py shapes: batch=64 commit/verify, 1-blob cells, 128-cell verify.
    # drive_e2e shapes: batch buckets {1, 8} via the vector suite.
    blobs = [rand_blob() for _ in range(64)]

    for B in (1, 64):
        commits = ctx.blob_to_kzg_commitment_batch(blobs[:B])
        log(f"commit batch={B}")
    proofs = [ctx.compute_blob_kzg_proof(b, c)
              for b, c in zip(blobs[:2], commits[:2])]
    log("compute_blob_kzg_proof")
    ctx.compute_kzg_proof(blobs[0], b"\x00" * 31 + b"\x07")
    log("compute_kzg_proof")
    proofs = [ctx.compute_blob_kzg_proof(b, c)
              for b, c in zip(blobs, commits)]
    log("proofs for batch=64 ready")

    ctx.verify_blob_kzg_proof(blobs[0], commits[0], proofs[0])
    log("verify_blob (single)")
    for B in (2, 8, 16, 64):
        ctx.verify_blob_kzg_proof_batch(blobs[:B], commits[:B], proofs[:B])
        log(f"verify_blob_batch batch={B}")

    z = b"\x00" * 31 + b"\x07"
    proof, y = ctx.compute_kzg_proof(blobs[0], z)
    ctx.verify_kzg_proof(commits[0], z, y, proof)
    log("verify_kzg_proof")

    cells, cell_proofs = ctx.compute_cells_and_kzg_proofs(blobs[0])
    log("compute_cells_and_kzg_proofs")
    ctx.compute_cells_and_kzg_proofs_batch(blobs[:8])
    log("compute_cells_and_kzg_proofs_batch batch=8")
    ctx.compute_cells(blobs[0])
    log("compute_cells")

    idxs = list(range(128))
    for B in (1, 8, 64, 128):
        ctx.verify_cell_kzg_proof_batch([commits[0]] * B, idxs[:B],
                                        cells[:B], cell_proofs[:B])
        log(f"verify_cell_batch batch={B}")

    half = list(range(0, 128, 2))
    ctx.recover_cells_and_compute_kzg_proofs(
        half, [cells[i] for i in half])
    log("recover_cells_and_compute_kzg_proofs")

    log("ALL SHAPES PRIMED")


if __name__ == "__main__":
    main()
