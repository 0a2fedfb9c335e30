"""Full benchmark matrix, mirroring the reference's bench suite.

Reference ops covered (reference: bench_test.go:48-124,
bench_eip7594_test.go:10-60, bench_test.go:126-133 DeserializeBlob,
fiatshamir_test.go:39 ComputeChallenge):

  BlobToKZGCommitment            single-blob latency
  ComputeKZGProof                single latency
  ComputeBlobKZGProof            single latency
  VerifyKZGProof                 single latency
  VerifyBlobKZGProof             single latency
  VerifyBlobKZGProofBatch        count = 1,2,4,...,64
  VerifyBlobKZGProofBatchPar     same counts (device-data-parallel alias)
  ComputeCells                   single
  ComputeCellsAndKZGProofs       single
  RecoverCellsAndComputeKZGProofs  (extra; not in the reference bench)
  VerifyCellKZGProofBatch        count = 1,8,32,64,128
  DeserializeBlob                host codec
  ComputeChallenge               Fiat-Shamir hash

Prints one markdown table + one JSON object (list of {op, ms, per_s}).
Run on the TPU with a warm compile cache or the first iteration of every
shape recompiles (5-20 min each over the remote tunnel); each op does one
untimed warmup call first.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REPS = 3


def _timeit(fn, reps=REPS):
    fn()  # warmup / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import numpy as np
    from goethkzg_tpu.api import Context
    from goethkzg_tpu.constants import R_MOD
    from goethkzg_tpu import fiatshamir, serialization

    ctx = Context()
    rng = np.random.default_rng(0)

    def rand_blob():
        out = bytearray()
        for _ in range(4096):
            out += (int.from_bytes(rng.bytes(32), "big") % R_MOD).to_bytes(
                32, "big")
        return bytes(out)

    n = 64
    blobs = [rand_blob() for _ in range(n)]
    commitments = ctx.blob_to_kzg_commitment_batch(blobs)
    proofs = [ctx.compute_blob_kzg_proof(b, c)
              for b, c in zip(blobs, commitments)]
    z = (int.from_bytes(rng.bytes(32), "big") % R_MOD).to_bytes(32, "big")

    rows = []

    def bench(name, fn, count=1):
        t = _timeit(fn)
        rows.append({"op": name, "ms": round(t * 1e3, 3),
                     "per_s": round(count / t, 2)})
        print(f"  {name}: {t*1e3:.2f} ms  ({count/t:.1f}/s)", flush=True)

    bench("BlobToKZGCommitment",
          lambda: ctx.blob_to_kzg_commitment(blobs[0]))
    bench("ComputeKZGProof",
          lambda: ctx.compute_kzg_proof(blobs[0], z))
    bench("ComputeBlobKZGProof",
          lambda: ctx.compute_blob_kzg_proof(blobs[0], commitments[0]))

    proof0, y0 = ctx.compute_kzg_proof(blobs[0], z)
    bench("VerifyKZGProof",
          lambda: ctx.verify_kzg_proof(commitments[0], z, y0, proof0))
    bench("VerifyBlobKZGProof",
          lambda: ctx.verify_blob_kzg_proof(blobs[0], commitments[0],
                                            proofs[0]))

    i = 1
    while i <= n:
        k = i
        bench(f"VerifyBlobKZGProofBatch(count={k})",
              lambda k=k: ctx.verify_blob_kzg_proof_batch(
                  blobs[:k], commitments[:k], proofs[:k]), count=k)
        i *= 2
    i = 1
    while i <= n:
        k = i
        bench(f"VerifyBlobKZGProofBatchPar(count={k})",
              lambda k=k: ctx.verify_blob_kzg_proof_batch_par(
                  blobs[:k], commitments[:k], proofs[:k]), count=k)
        i *= 2

    bench("ComputeCells", lambda: ctx.compute_cells(blobs[0]))
    bench("ComputeCellsAndKZGProofs",
          lambda: ctx.compute_cells_and_kzg_proofs(blobs[0]))

    cells, cell_proofs = ctx.compute_cells_and_kzg_proofs(blobs[0])
    half_ids = list(range(64))
    half_cells = [cells[i] for i in half_ids]
    bench("RecoverCellsAndComputeKZGProofs(half)",
          lambda: ctx.recover_cells_and_compute_kzg_proofs(
              half_ids, half_cells))

    for k in (1, 8, 32, 64, 128):
        bench(f"VerifyCellKZGProofBatch(count={k})",
              lambda k=k: ctx.verify_cell_kzg_proof_batch(
                  [commitments[0]] * k, list(range(k)), cells[:k],
                  cell_proofs[:k]), count=k)

    bench("DeserializeBlob",
          lambda: serialization.deserialize_blob(blobs[0]))
    bench("ComputeChallenge",
          lambda: fiatshamir.compute_challenge(blobs[0], commitments[0]))

    print("\n| op | ms | per_s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['op']} | {r['ms']} | {r['per_s']} |")
    print(json.dumps({"matrix": rows}))


if __name__ == "__main__":
    main()
