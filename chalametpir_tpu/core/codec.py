"""KV row codec: bit-pack (hashed_key || value || 0x81) into b-bit elements.

Bit-exact equivalent of the reference codec (reference:
chalametpir_common/src/serialization.rs:22-184). The byte stream is
interpreted as a little-endian bit stream; element `e` of a row holds
bits [e*b, e*b + b), zero-padded past the boundary marker.

Everything here is vectorised numpy: a whole database's rows are encoded
in one call (chunked internally to bound the bit-matrix working set).
"""

from __future__ import annotations

import numpy as np

from ..errors import RowNotDecodable
from ..params import HASHED_KEY_BYTE_LEN

BOUNDARY_MARKER = 0x81


def encoded_row_width(max_value_byte_len: int, mat_elem_bit_len: int) -> int:
    """Number of matrix columns for a DB whose longest value is
    `max_value_byte_len` bytes (reference: matrix.rs:700)."""
    total_bits = HASHED_KEY_BYTE_LEN * 8 + max_value_byte_len * 8 + 8
    return -(-total_bits // mat_elem_bit_len)


def encode_rows(
    hashed_keys: np.ndarray,
    values: list[bytes],
    mat_elem_bit_len: int,
    num_cols: int,
) -> np.ndarray:
    """Encode n (hashed_key, value) pairs into an (n, num_cols) uint32 row
    matrix (reference: serialization.rs:22-116, vectorised across rows).

    hashed_keys: (n, HASHED_KEY_BYTE_LEN) uint8 digests.
    """
    n = len(values)
    hashed_keys = np.asarray(hashed_keys, np.uint8).reshape(n, HASHED_KEY_BYTE_LEN)
    out = np.empty((n, num_cols), dtype=np.uint32)
    # bound the chunk WORKING SET to ~256 MB: the unpacked uint8 bit
    # matrix is stream_bytes*8 per row, and _encode_chunk's uint32 cast
    # of it is another 4x on top — 5x total, not 1x
    stream_bytes = -(-num_cols * mat_elem_bit_len // 8)
    chunk = max(1, (256 << 20) // max(1, stream_bytes * 8 * 5))
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        out[lo:hi] = _encode_chunk(
            hashed_keys[lo:hi], values[lo:hi], mat_elem_bit_len, num_cols
        )
    return out


def _encode_chunk(hashed_keys, values, b, num_cols):
    n = len(values)
    stream_bytes = -(-num_cols * b // 8)
    buf = np.zeros((n, stream_bytes), dtype=np.uint8)
    buf[:, :HASHED_KEY_BYTE_LEN] = hashed_keys
    for i, v in enumerate(values):
        lv = len(v)
        buf[i, HASHED_KEY_BYTE_LEN : HASHED_KEY_BYTE_LEN + lv] = np.frombuffer(v, np.uint8)
        buf[i, HASHED_KEY_BYTE_LEN + lv] = BOUNDARY_MARKER
    bits = np.unpackbits(buf, axis=1, bitorder="little")
    need = num_cols * b
    if bits.shape[1] < need:
        bits = np.pad(bits, ((0, 0), (0, need - bits.shape[1])))
    else:
        bits = bits[:, :need]
    weights = (np.uint32(1) << np.arange(b, dtype=np.uint32)).astype(np.uint32)
    return bits.reshape(n, num_cols, b).astype(np.uint32) @ weights


def encode_kv_as_row(key_digest: np.ndarray | bytes, value: bytes, mat_elem_bit_len: int, num_cols: int) -> np.ndarray:
    """Single-row convenience wrapper (reference: serialization.rs:22)."""
    if isinstance(key_digest, (bytes, bytearray)):
        key_digest = np.frombuffer(bytes(key_digest), np.uint8)
    return encode_rows(key_digest[None, :], [value], mat_elem_bit_len, num_cols)[0]


def decode_kv_from_row(row: np.ndarray, mat_elem_bit_len: int) -> bytes:
    """Recover (hashed_key || value) bytes from a plaintext row
    (reference: serialization.rs:132-184).

    Raises RowNotDecodable unless a boundary marker is found with an
    all-zero tail after it and at least the 32-byte digest before it.
    """
    row = np.asarray(row, np.uint32)
    b = mat_elem_bit_len
    num_extractable_bits = (row.shape[0] * b) & ~7
    nbytes = num_extractable_bits // 8

    shifts = np.arange(b, dtype=np.uint32)
    bits = ((row[:, None] >> shifts[None, :]) & np.uint32(1)).astype(np.uint8).reshape(-1)
    kv = np.packbits(bits[:num_extractable_bits], bitorder="little").tobytes()

    boundary = kv.rfind(bytes([BOUNDARY_MARKER]))
    if boundary < 0:
        raise RowNotDecodable()
    if any(kv[boundary + 1 :]) or boundary <= HASHED_KEY_BYTE_LEN:
        raise RowNotDecodable()
    return kv[:boundary]
