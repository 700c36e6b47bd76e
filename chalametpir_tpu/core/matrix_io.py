"""Matrix wire format and bit-pack compression, over numpy uint32 arrays.

The framework represents matrices as plain numpy/JAX uint32 arrays; this
module provides the reference-compatible byte serialisation
(reference: chalametpir_common/src/matrix.rs:947-1010) and the row-wise
bit-pack compression used to shrink the transposed DB
(reference: matrix.rs:98-316). Wire format:

    rows: u32 LE || cols: u32 LE || elements row-major as u32 LE

Compression factor: 4 when b in [4,8], 3 when b in [9,10], 2 when b in
[11,14], packing that many b-bit elements per u32 word at 32/cf-bit
stride (reference: matrix.rs:103-199).
"""

from __future__ import annotations

import numpy as np

from ..errors import (
    FailedToDeserializeMatrixFromBytes,
    ImpossibleEncodedDBMatrixElementBitLength,
    IncompatibleDimensionForMatrixAddition,
    InvalidMatrixDimension,
    InvalidNumberOfElementsInMatrix,
)
from ..params import MAX_CIPHER_TEXT_BIT_LEN, MIN_CIPHER_TEXT_BIT_LEN


def matrix_to_bytes(mat: np.ndarray) -> bytes:
    """Serialize a 2-D uint32 matrix (reference: matrix.rs:947-971)."""
    mat = np.ascontiguousarray(mat, dtype="<u4")
    rows, cols = mat.shape
    header = np.array([rows, cols], dtype="<u4").tobytes()
    return header + mat.tobytes()


def matrix_from_bytes(data: bytes) -> np.ndarray:
    """Deserialize, validating the exact byte length
    (reference: matrix.rs:973-1010)."""
    if len(data) <= 8:
        raise FailedToDeserializeMatrixFromBytes()
    rows, cols = np.frombuffer(data[:8], dtype="<u4")
    num_elems = int(rows) * int(cols)
    if num_elems == 0:
        raise InvalidMatrixDimension()
    if len(data) - 8 != 4 * num_elems:
        raise InvalidNumberOfElementsInMatrix()
    return np.frombuffer(data[8:], dtype="<u4").reshape(int(rows), int(cols)).copy()


def matrix_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise wrapping add mod 2^32 (reference: matrix.rs:1061-1086)."""
    a = np.asarray(a, np.uint32)
    b = np.asarray(b, np.uint32)
    if a.shape != b.shape:
        raise IncompatibleDimensionForMatrixAddition()
    return a + b  # numpy uint32 wraps


def compression_factor(mat_elem_bit_len: int) -> int:
    """Elements packed per u32 word (reference: matrix.rs:103-199)."""
    if not MIN_CIPHER_TEXT_BIT_LEN <= mat_elem_bit_len <= MAX_CIPHER_TEXT_BIT_LEN:
        raise ImpossibleEncodedDBMatrixElementBitLength()
    if mat_elem_bit_len >= 11:
        return 2
    if mat_elem_bit_len >= 9:
        return 3
    return 4


def row_wise_compress(mat: np.ndarray, mat_elem_bit_len: int) -> np.ndarray:
    """Bit-pack b-bit elements, `cf` per u32 word (reference: matrix.rs:98-205)."""
    cf = compression_factor(mat_elem_bit_len)
    stride = 32 // cf
    mask = np.uint32((1 << mat_elem_bit_len) - 1)
    rows, cols = mat.shape
    out_cols = -(-cols // cf)
    padded = np.zeros((rows, out_cols * cf), dtype=np.uint32)
    padded[:, :cols] = mat & mask
    lanes = padded.reshape(rows, out_cols, cf)
    out = lanes[:, :, 0].copy()
    for i in range(1, cf):
        out |= lanes[:, :, i] << np.uint32(stride * i)
    return out


def row_wise_decompress(mat: np.ndarray, mat_elem_bit_len: int, num_cols: int) -> np.ndarray:
    """Inverse of row_wise_compress (reference: matrix.rs:207-316)."""
    cf = compression_factor(mat_elem_bit_len)
    stride = 32 // cf
    mask = np.uint32((1 << mat_elem_bit_len) - 1)
    rows, packed_cols = mat.shape
    if packed_cols != -(-num_cols // cf):
        # a shape bug, not a bit-length problem: the packed column count
        # doesn't correspond to the claimed logical width
        raise InvalidNumberOfElementsInMatrix()
    out = np.empty((rows, packed_cols * cf), dtype=np.uint32)
    for i in range(cf):
        out[:, i::cf] = (mat >> np.uint32(stride * i)) & mask
    return out[:, :num_cols]
