"""Consensus-spec conformance: all vendored YAML vectors, end to end.

The bit-exact acceptance suite (SURVEY.md §4.1).  Invalid cases have
output null and must error; verification failures (pairing mismatch) map
to output false via ErrVerifyOpeningProof, mirroring the reference
harness's distinction (consensus_specs_test.go:216-227).
"""

import pytest

from goethkzg_tpu.errors import ErrVerifyOpeningProof, KZGError
from goethkzg_tpu.golden.curve import DeserializationError

from .conftest import load_vectors

pytestmark = pytest.mark.heavy


def hx(s):
    return bytes.fromhex(s[2:])


def run_compute(fn, inp, expect):
    try:
        got = fn(inp)
    except (KZGError, DeserializationError, ValueError):
        assert expect is None, "unexpected error for valid input"
        return
    assert expect is not None, "expected an error"
    assert got == expect


def run_verify(fn, inp, expect):
    try:
        fn(inp)
        assert expect is True
    except ErrVerifyOpeningProof:
        assert expect is False
    except (KZGError, DeserializationError, ValueError):
        assert expect is None


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("blob_to_kzg_commitment"))
def test_blob_to_kzg_commitment(ctx, name, inp, expect):
    run_compute(lambda i: "0x" + ctx.blob_to_kzg_commitment(hx(i["blob"])).hex(),
                inp, expect)


@pytest.mark.parametrize("name,inp,expect", load_vectors("compute_kzg_proof"))
def test_compute_kzg_proof(ctx, name, inp, expect):
    def fn(i):
        proof, y = ctx.compute_kzg_proof(hx(i["blob"]), hx(i["z"]))
        return ["0x" + proof.hex(), "0x" + y.hex()]
    run_compute(fn, inp, expect)


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("compute_blob_kzg_proof"))
def test_compute_blob_kzg_proof(ctx, name, inp, expect):
    run_compute(
        lambda i: "0x" + ctx.compute_blob_kzg_proof(
            hx(i["blob"]), hx(i["commitment"])).hex(),
        inp, expect)


@pytest.mark.parametrize("name,inp,expect", load_vectors("verify_kzg_proof"))
def test_verify_kzg_proof(ctx, name, inp, expect):
    run_verify(
        lambda i: ctx.verify_kzg_proof(hx(i["commitment"]), hx(i["z"]),
                                       hx(i["y"]), hx(i["proof"])),
        inp, expect)


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("verify_blob_kzg_proof"))
def test_verify_blob_kzg_proof(ctx, name, inp, expect):
    run_verify(
        lambda i: ctx.verify_blob_kzg_proof(hx(i["blob"]), hx(i["commitment"]),
                                            hx(i["proof"])),
        inp, expect)


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("verify_blob_kzg_proof_batch"))
def test_verify_blob_kzg_proof_batch(ctx, name, inp, expect):
    run_verify(
        lambda i: ctx.verify_blob_kzg_proof_batch(
            [hx(x) for x in i["blobs"]], [hx(x) for x in i["commitments"]],
            [hx(x) for x in i["proofs"]]),
        inp, expect)


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("compute_cells_and_kzg_proofs"))
def test_compute_cells_and_kzg_proofs(ctx, name, inp, expect):
    def fn(i):
        cells, proofs = ctx.compute_cells_and_kzg_proofs(hx(i["blob"]))
        return [["0x" + c.hex() for c in cells],
                ["0x" + p.hex() for p in proofs]]
    run_compute(fn, inp, expect)


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("recover_cells_and_kzg_proofs"))
def test_recover_cells_and_kzg_proofs(ctx, name, inp, expect):
    def fn(i):
        cells, proofs = ctx.recover_cells_and_compute_kzg_proofs(
            list(i["cell_indices"]), [hx(c) for c in i["cells"]])
        return [["0x" + c.hex() for c in cells],
                ["0x" + p.hex() for p in proofs]]
    run_compute(fn, inp, expect)


@pytest.mark.parametrize("name,inp,expect",
                         load_vectors("verify_cell_kzg_proof_batch"))
def test_verify_cell_kzg_proof_batch(ctx, name, inp, expect):
    run_verify(
        lambda i: ctx.verify_cell_kzg_proof_batch(
            [hx(x) for x in i["commitments"]], list(i["cell_indices"]),
            [hx(x) for x in i["cells"]], [hx(x) for x in i["proofs"]]),
        inp, expect)
