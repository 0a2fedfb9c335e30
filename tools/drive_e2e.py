"""End-to-end smoke drive on the real TPU: a few vectors through EVERY
public op of goethkzg_tpu.api.Context, compared bit-exactly.

Much lighter than the full conformance suite (311 vectors, hours cold):
per op it runs the first K valid + first K invalid vendored vectors.

    cd /root/repo && nohup python tools/drive_e2e.py > /tmp/drive.log 2>&1 &

Prints PASS/FAIL per case and a final summary line.
"""

import glob
import os
import sys
import time

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VECTOR_ROOT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")
K = 3


def hx(s):
    return bytes.fromhex(s[2:])


def load(op):
    files = sorted(glob.glob(f"{VECTOR_ROOT}/{op}/*/*/data.yaml"))
    valid, invalid = [], []
    for f in files:
        d = yaml.safe_load(open(f))
        name = f.split(os.sep)[-2]
        (valid if d["output"] is not None else invalid).append(
            (name, d["input"], d["output"]))
    return valid[:K] + invalid[:K]


def main():
    from goethkzg_tpu.api import new_context_4096_secure
    from goethkzg_tpu.errors import ErrVerifyOpeningProof, KZGError
    from goethkzg_tpu.golden.curve import DeserializationError

    ctx = new_context_4096_secure()
    passed = failed = 0

    def check(op, name, fn, expect, is_verify):
        nonlocal passed, failed
        t0 = time.time()
        try:
            got = fn()
            ok = (expect is True) if is_verify else (got == expect)
        except ErrVerifyOpeningProof:
            ok = is_verify and expect is False
        except (KZGError, DeserializationError, ValueError):
            ok = expect is None
        except Exception as e:            # noqa: BLE001 — report, keep going
            print(f"FAIL {op}/{name}: crashed {type(e).__name__}: {e}",
                  flush=True)
            failed += 1
            return
        status = "PASS" if ok else "FAIL"
        if ok:
            passed += 1
        else:
            failed += 1
        print(f"{status} {op}/{name} ({time.time()-t0:.1f}s)", flush=True)

    for name, i, out in load("blob_to_kzg_commitment"):
        check("commit", name,
              lambda i=i: "0x" + ctx.blob_to_kzg_commitment(hx(i["blob"])).hex(),
              out, False)

    for name, i, out in load("compute_kzg_proof"):
        def fn(i=i):
            proof, y = ctx.compute_kzg_proof(hx(i["blob"]), hx(i["z"]))
            return ["0x" + proof.hex(), "0x" + y.hex()]
        check("compute_proof", name, fn, out, False)

    for name, i, out in load("compute_blob_kzg_proof"):
        check("compute_blob_proof", name,
              lambda i=i: "0x" + ctx.compute_blob_kzg_proof(
                  hx(i["blob"]), hx(i["commitment"])).hex(), out, False)

    for name, i, out in load("verify_kzg_proof"):
        check("verify", name,
              lambda i=i: ctx.verify_kzg_proof(hx(i["commitment"]), hx(i["z"]),
                                               hx(i["y"]), hx(i["proof"])),
              out, True)

    for name, i, out in load("verify_blob_kzg_proof"):
        check("verify_blob", name,
              lambda i=i: ctx.verify_blob_kzg_proof(
                  hx(i["blob"]), hx(i["commitment"]), hx(i["proof"])),
              out, True)

    for name, i, out in load("verify_blob_kzg_proof_batch"):
        check("verify_blob_batch", name,
              lambda i=i: ctx.verify_blob_kzg_proof_batch(
                  [hx(b) for b in i["blobs"]],
                  [hx(c) for c in i["commitments"]],
                  [hx(p) for p in i["proofs"]]), out, True)

    for name, i, out in load("compute_cells_and_kzg_proofs"):
        def fnc(i=i):
            cells, proofs = ctx.compute_cells_and_kzg_proofs(hx(i["blob"]))
            return [["0x" + c.hex() for c in cells],
                    ["0x" + p.hex() for p in proofs]]
        check("cells_proofs", name, fnc, out, False)

    # batched cells (TPU-first extension): must be bit-identical per blob
    batch_vec = [(name, i, out)
                 for name, i, out in load("compute_cells_and_kzg_proofs")
                 if out is not None][:2]
    if batch_vec:
        def fnb():
            outs = ctx.compute_cells_and_kzg_proofs_batch(
                [hx(i["blob"]) for _, i, _ in batch_vec])
            return [[["0x" + c.hex() for c in cells],
                     ["0x" + p.hex() for p in proofs]]
                    for cells, proofs in outs]
        check("cells_proofs_batch", "batch2_vs_vectors", fnb,
              [out for _, _, out in batch_vec], False)

    for name, i, out in load("recover_cells_and_kzg_proofs"):
        def fnr(i=i):
            cells, proofs = ctx.recover_cells_and_compute_kzg_proofs(
                list(i["cell_indices"]), [hx(c) for c in i["cells"]])
            return [["0x" + c.hex() for c in cells],
                    ["0x" + p.hex() for p in proofs]]
        check("recover", name, fnr, out, False)

    for name, i, out in load("verify_cell_kzg_proof_batch"):
        check("verify_cell_batch", name,
              lambda i=i: ctx.verify_cell_kzg_proof_batch(
                  [hx(c) for c in i["commitments"]],
                  list(i["cell_indices"]),
                  [hx(c) for c in i["cells"]],
                  [hx(p) for p in i["proofs"]]), out, True)

    print(f"SUMMARY passed={passed} failed={failed}", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
