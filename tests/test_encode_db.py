"""DB encode + plaintext recover (reference: matrix.rs:1136-1232)."""

import numpy as np
import pytest

from chalametpir_tpu.core import encode_db
from chalametpir_tpu.errors import DecodedRowNotPrependedWithDigestOfKey, EmptyKVDatabase
from chalametpir_tpu.utils import generate_random_kv_database


@pytest.mark.parametrize("arity", [3, 4])
def test_encode_and_recover(arity, rng):
    for _ in range(3):
        n = int(rng.integers(1 << 8, 1 << 10))
        b = int(rng.integers(4, 15))
        db = generate_random_kv_database(n, rng=rng, value_byte_len=(1, 64))
        mat, filt = encode_db.from_kv_database(db, arity, b, rng=rng)
        assert mat.shape[0] == filt.num_fingerprints
        assert (mat < (1 << b)).all()
        keys = list(db.keys())
        for idx in rng.integers(0, n, size=8):
            key = keys[int(idx)]
            assert encode_db.recover_value(mat, key, filt) == db[key]


def test_recover_missing_key_fails(rng):
    db = generate_random_kv_database(512, rng=rng, value_byte_len=(1, 32))
    mat, filt = encode_db.from_kv_database(db, 3, 10, rng=rng)
    with pytest.raises(Exception) as exc_info:
        encode_db.recover_value(mat, b"definitely-not-a-key", filt)
    assert exc_info.type.__name__ in (
        "RowNotDecodable",
        "DecodedRowNotPrependedWithDigestOfKey",
    )


def test_empty_db_rejected():
    with pytest.raises(EmptyKVDatabase):
        encode_db.from_kv_database({}, 3, 10)
