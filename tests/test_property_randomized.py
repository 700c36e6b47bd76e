"""Randomized N-iteration property tests (the reference's co-located
property style: random DB sizes 2^8-2^16 x random b in [4,14] for 100
iterations, matrix.rs:1136-1232; exhaustive serde sweeps,
serialization.rs:228-315).

Every invocation draws fresh sizes/widths/keys from the session seed
(printed in the pytest header; reproduce with PIR_TEST_SEED). Iteration
count scales with PIR_TEST_PROPERTY_ITERS (default 12; the reference
runs 100 in its release-profile CI).
"""

import os

import numpy as np
import pytest

from chalametpir_tpu.core import codec, encode_db, matrix_io
from chalametpir_tpu.core.filter import BinaryFuseFilter
from chalametpir_tpu.utils import generate_random_kv_database

ITERS = int(os.environ.get("PIR_TEST_PROPERTY_ITERS", "12"))


@pytest.mark.parametrize("arity", [3, 4])
def test_encode_and_recover_random_geometries(arity, rng):
    """Mirror of matrix.rs:1136-1232: encode a random DB at a random size
    and element width, then recover random keys from D in plaintext."""
    for _ in range(ITERS):
        n = int(rng.integers(1 << 8, 1 << 14))
        b = int(rng.integers(4, 15))  # the reference's full b range
        db = generate_random_kv_database(n, rng=rng, value_byte_len=(1, 64))
        mat, filt = encode_db.from_kv_database(db, arity, b, rng=rng)
        keys = list(db.keys())
        for idx in rng.integers(0, n, size=6):
            key = keys[int(idx)]
            assert encode_db.recover_value(mat, key, filt) == db[key]


def test_codec_roundtrip_random(rng):
    """Random key/value lengths x random b x padded widths
    (serialization.rs:228-315's sweep, randomized)."""
    for _ in range(ITERS * 4):
        b = int(rng.integers(4, 15))
        vlen = int(rng.integers(1, 64))
        digest = rng.bytes(32)
        value = rng.bytes(vlen)
        width = codec.encoded_row_width(vlen, b) + int(rng.integers(0, 8))
        row = codec.encode_kv_as_row(digest, value, b, width)
        kv = codec.decode_kv_from_row(row, b)
        assert kv[:32] == digest and kv[32:] == value


def test_matrix_serde_roundtrip_random(rng):
    """Matrix wire-format round trip at random shapes
    (matrix.rs:1448-1486)."""
    for _ in range(ITERS * 4):
        r = int(rng.integers(1, 64))
        c = int(rng.integers(1, 64))
        mat = rng.integers(0, 1 << 32, size=(r, c), dtype=np.uint32)
        assert np.array_equal(
            matrix_io.matrix_from_bytes(matrix_io.matrix_to_bytes(mat)), mat
        )


def test_filter_param_serde_roundtrip_random(rng):
    from chalametpir_tpu.core.filter import filter_geometry

    for _ in range(ITERS * 4):
        arity = int(rng.integers(3, 5))
        # from_bytes enforces FULL geometry consistency with
        # filter_geometry(arity, filter_size) — the fuzz draws a random
        # size and derives the one legit geometry, like construction does
        filt_size = int(rng.integers(1, 1 << 26))
        seg_len, seg_cnt_len, num_fp = filter_geometry(arity, filt_size)
        filt = BinaryFuseFilter(
            seed=rng.bytes(32),
            arity=arity,
            segment_length=seg_len,
            segment_count_length=seg_cnt_len,
            num_fingerprints=num_fp,
            filter_size=filt_size,
            mat_elem_bit_len=int(rng.integers(4, 15)),
        )
        assert BinaryFuseFilter.from_bytes(filt.to_bytes()) == filt


@pytest.mark.parametrize("arity", [3, 4])
def test_full_pir_round_trip_random_geometry(arity, rng):
    """Random-size end-to-end PIR (integrations/src/test_pir.rs:13-142
    randomizes 2^8-2^16 x 10 keys x 10 iterations)."""
    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator

    for _ in range(max(1, ITERS // 4)):
        n = int(rng.integers(1 << 8, 1 << 12))
        db = generate_random_kv_database(n, rng=rng, value_byte_len=(1, 128))
        seed = rng.bytes(32)
        server, hint, fparams = Server.setup(seed, db, arity=arity, rng=rng)
        client = Client.setup(seed, hint, fparams)
        keys = list(db.keys())
        for idx in rng.integers(0, n, size=4):
            key = keys[int(idx)]
            while True:
                try:
                    q = client.query(key)
                    break
                except ArithmeticOverflowAddingQueryIndicator:
                    continue
            assert client.process_response(key, server.respond(q)) == db[key]


def test_client_server_persistence_random_geometry(rng, tmp_path):
    """Randomized persistence property: at random DB geometries, both
    roles survive a save/load with pending queries in flight and answer
    identically afterward."""
    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator

    for it in range(max(1, ITERS // 8)):
        n = int(rng.integers(1 << 8, 1 << 11))
        vmax = int(rng.integers(8, 256))
        db = generate_random_kv_database(n, rng=rng, value_byte_len=(1, vmax))
        seed = rng.bytes(32)
        arity = int(rng.choice([3, 4]))
        server, hint, fparams = Server.setup(seed, db, arity=arity, rng=rng)
        client = Client.setup(seed, hint, fparams, device=False)
        keys = [list(db.keys())[int(i)] for i in rng.integers(0, n, size=3)]
        queries = {}
        for key in dict.fromkeys(keys):
            while True:
                try:
                    queries[key] = client.query(key)
                    break
                except ArithmeticOverflowAddingQueryIndicator:
                    continue
        spath = str(tmp_path / f"s{it}")
        cpath = str(tmp_path / f"c{it}")
        server.save(spath)
        client.save(cpath)
        server2 = Server.load(spath)
        client2 = Client.load(cpath, device=False)
        for key, q in queries.items():
            assert client2.process_response(key, server2.respond(q)) == db[key]
