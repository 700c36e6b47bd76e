"""Matrix wire format + bit-pack compression
(reference: matrix.rs:947-1010, 98-316, tests at matrix.rs:1448-1604)."""

import numpy as np
import pytest

from chalametpir_tpu.core import matrix_io
from chalametpir_tpu.errors import (
    FailedToDeserializeMatrixFromBytes,
    ImpossibleEncodedDBMatrixElementBitLength,
    IncompatibleDimensionForMatrixAddition,
    InvalidMatrixDimension,
    InvalidNumberOfElementsInMatrix,
)


def test_serde_roundtrip(rng):
    mat = rng.integers(0, 1 << 32, size=(13, 37), dtype=np.uint32)
    blob = matrix_io.matrix_to_bytes(mat)
    assert len(blob) == 8 + 4 * 13 * 37
    assert np.array_equal(matrix_io.matrix_from_bytes(blob), mat)


def test_serde_wire_layout():
    mat = np.array([[0x01020304, 0xAABBCCDD]], np.uint32)
    blob = matrix_io.matrix_to_bytes(mat)
    assert blob[:8] == bytes([1, 0, 0, 0, 2, 0, 0, 0])
    assert blob[8:12] == bytes([0x04, 0x03, 0x02, 0x01])  # LE elements


@pytest.mark.parametrize(
    ("blob", "err"),
    [
        (b"", FailedToDeserializeMatrixFromBytes),
        (b"\0" * 8, FailedToDeserializeMatrixFromBytes),
        # wrong element count for the declared dims (matrix.rs:978-999)
        (bytes([1, 0, 0, 0, 2, 0, 0, 0]) + b"\0" * 7, InvalidNumberOfElementsInMatrix),
        # zero dimension
        (bytes([0, 0, 0, 0, 2, 0, 0, 0]) + b"\0" * 8, InvalidMatrixDimension),
    ],
)
def test_serde_rejects_malformed(blob, err):
    with pytest.raises(err):
        matrix_io.matrix_from_bytes(blob)


@pytest.mark.parametrize("b", range(4, 15))
def test_compress_decompress_roundtrip(b, rng):
    cf = matrix_io.compression_factor(b)
    assert cf == (2 if b >= 11 else 3 if b >= 9 else 4)
    for cols in (cf * 10, cf * 10 + 1, cf * 10 + cf - 1):
        mat = rng.integers(0, 1 << b, size=(17, cols), dtype=np.uint32)
        packed = matrix_io.row_wise_compress(mat, b)
        assert packed.shape == (17, -(-cols // cf))
        back = matrix_io.row_wise_decompress(packed, b, cols)
        assert np.array_equal(back, mat)


def test_compression_factor_bounds():
    for b in (0, 3, 15, 32):
        with pytest.raises(ImpossibleEncodedDBMatrixElementBitLength):
            matrix_io.compression_factor(b)


def test_matrix_add_wraps_and_checks():
    a = np.array([[0xFFFFFFFF, 1]], np.uint32)
    b = np.array([[2, 3]], np.uint32)
    assert np.array_equal(matrix_io.matrix_add(a, b), np.array([[1, 4]], np.uint32))
    with pytest.raises(IncompatibleDimensionForMatrixAddition):
        matrix_io.matrix_add(a, b.T)
