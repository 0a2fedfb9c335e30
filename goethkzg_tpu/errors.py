"""Error taxonomy, mirroring the reference's sentinel errors
(reference: errors.go:5-21, internal/kzg/errors.go).

The library never raises on the hot path for valid inputs; all validation
errors are typed exceptions so callers can distinguish "malformed input"
from "proof did not verify" (ErrVerifyOpeningProof), matching the spec-test
conventions (SURVEY.md §4.1).
"""


class KZGError(Exception):
    """Base class for all library errors."""


class ErrBatchLengthCheck(KZGError):
    def __init__(self, msg="all designated elements in the batch should have the same size"):
        super().__init__(msg)


class ErrNonCanonicalScalar(KZGError):
    def __init__(self, msg="scalar is not canonical when interpreted as a big integer in big-endian"):
        super().__init__(msg)


class ErrInvalidCellID(KZGError):
    def __init__(self, msg="cell ID should be less than CellsPerExtBlob"):
        super().__init__(msg)


class ErrInvalidRowIndex(KZGError):
    def __init__(self, msg="row index should be less than the number of row commitments"):
        super().__init__(msg)


class ErrDeserializeNilInput(KZGError):
    def __init__(self, msg="cannot deserialize nil input"):
        super().__init__(msg)


class ErrNumCellIDsNotEqualNumCells(KZGError):
    def __init__(self, msg="number of cell IDs should be equal to the number of cells"):
        super().__init__(msg)


class ErrCellIDsNotOrdered(KZGError):
    def __init__(self, msg="cell IDs are not ordered (ascending)"):
        super().__init__(msg)


class ErrFoundInvalidCellID(KZGError):
    def __init__(self, msg="cell ID should be less than CellsPerExtBlob"):
        super().__init__(msg)


class ErrNotEnoughCellsForReconstruction(KZGError):
    def __init__(self, msg="not enough cells to perform reconstruction"):
        super().__init__(msg)


class ErrVerifyOpeningProof(KZGError):
    """Pairing check failed: the proof is invalid (not malformed input)."""

    def __init__(self, msg="can't verify opening proof"):
        super().__init__(msg)


class ErrInvalidPolynomialSize(KZGError):
    def __init__(self, msg="invalid polynomial size"):
        super().__init__(msg)


class ErrPolynomialMismatchedSizeDomain(KZGError):
    def __init__(self, msg="domain size does not equal polynomial size"):
        super().__init__(msg)


class ErrMinSRSSize(KZGError):
    def __init__(self, msg="minimum srs size is 2"):
        super().__init__(msg)


class ErrInvalidNumDigests(KZGError):
    def __init__(self, msg="number of digests is not the same as the number of polynomials"):
        super().__init__(msg)
