"""Random KV-database fixtures (reference: chalametpir_common/src/utils.rs)."""

from __future__ import annotations

import numpy as np

MIN_KEY_BYTE_LEN = 16
MAX_KEY_BYTE_LEN = 32
MIN_VALUE_BYTE_LEN = 1
MAX_VALUE_BYTE_LEN = 512


def generate_random_kv_database(
    num_kv_pairs: int,
    rng: np.random.Generator | None = None,
    key_byte_len: tuple[int, int] = (MIN_KEY_BYTE_LEN, MAX_KEY_BYTE_LEN),
    value_byte_len: tuple[int, int] = (MIN_VALUE_BYTE_LEN, MAX_VALUE_BYTE_LEN),
) -> dict[bytes, bytes]:
    """Random keys (16-32 B) and values (1-512 B by default), like the
    reference fixture generator (reference: utils.rs:23-46)."""
    rng = rng or np.random.default_rng()
    db: dict[bytes, bytes] = {}
    while len(db) < num_kv_pairs:
        klen = int(rng.integers(key_byte_len[0], key_byte_len[1] + 1))
        vlen = int(rng.integers(value_byte_len[0], value_byte_len[1] + 1))
        key = rng.bytes(klen)
        db[key] = rng.bytes(vlen)
    return db
