"""KV row codec (reference: serialization.rs:228-315 test strategy)."""

import numpy as np
import pytest

from chalametpir_tpu.core import codec, hashing
from chalametpir_tpu.errors import RowNotDecodable


@pytest.mark.parametrize("b", range(7, 12))
def test_encode_decode_sweep(b, rng):
    # reduced grid of the reference's exhaustive sweep
    for key_len in (1, 7, 16, 32):
        for value_len in (1, 3, 17, 64):
            key = rng.bytes(key_len)
            value = rng.bytes(value_len)
            digest = hashing.hash_of_key(key)
            digest_bytes = np.asarray(digest).view(np.uint8)

            actual = -(-(32 * 8 + (value_len + 1) * 8) // b)
            widest = -(-(32 * 8 + (2 * value_len + 1) * 8) // b)
            for num_cols in {actual, (actual + widest) // 2, widest}:
                row = codec.encode_kv_as_row(digest_bytes, value, b, num_cols)
                assert row.shape == (num_cols,)
                assert (row < (1 << b)).all()
                kv = codec.decode_kv_from_row(row, b)
                assert kv[:32] == digest_bytes.tobytes()
                assert kv[32:] == value


def test_encode_rows_batch_matches_single(rng):
    b, num_cols = 9, 120
    n = 16
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    values = [rng.bytes(int(x)) for x in rng.integers(1, 80, size=n)]
    batch = codec.encode_rows(digests, values, b, num_cols)
    for i in range(n):
        single = codec.encode_kv_as_row(digests[i], values[i], b, num_cols)
        assert np.array_equal(batch[i], single)


def test_decode_rejects_missing_boundary():
    with pytest.raises(RowNotDecodable):
        codec.decode_kv_from_row(np.zeros(64, np.uint32), 8)


def test_decode_rejects_nonzero_tail(rng):
    digest = rng.integers(0, 256, size=32, dtype=np.uint8)
    row = codec.encode_kv_as_row(digest, b"hello", 8, 80)
    row[-1] = 0x55  # corrupt the zero tail
    with pytest.raises(RowNotDecodable):
        codec.decode_kv_from_row(row, 8)


def test_decode_rejects_boundary_inside_digest():
    # a boundary marker at index <= 32 must be rejected
    row = np.zeros(40, np.uint32)
    row[:8] = codec.encode_kv_as_row(np.zeros(32, np.uint8), b"", 8, 40)[:8]
    stream = np.zeros(40, np.uint8)
    stream[10] = codec.BOUNDARY_MARKER
    row = stream.astype(np.uint32)  # b=8: one byte per element
    with pytest.raises(RowNotDecodable):
        codec.decode_kv_from_row(row, 8)
