"""ctr-mode PRG: three engines agree, and full round trips work."""

import numpy as np
import pytest

from chalametpir_tpu import Client, Server
from chalametpir_tpu.core import keccak, prg
from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator
from chalametpir_tpu.utils import generate_random_kv_database


def test_ctr_block_definition(rng):
    seed = rng.bytes(32)
    blocks = prg._ctr_blocks(seed, 7, 3)
    for i in range(3):
        want = keccak.turboshake128(seed + int(7 + i).to_bytes(8, "little"), 168)
        assert blocks[i].tobytes() == want


def test_ctr_device_matches_host(rng):
    import jax.numpy as jnp  # noqa: F401

    from chalametpir_tpu.ops import prg_jax

    seed = rng.bytes(32)
    sw = prg_jax.seed_to_words(seed)
    rows, cols = 9, 411
    a_host = prg.expand_seed(rows, cols, seed, mode="ctr")
    a_dev = np.asarray(prg_jax.expand_rows_device(sw, 0, rows, cols))
    assert np.array_equal(a_dev, a_host)
    assert np.array_equal(
        np.asarray(prg_jax.expand_rows_device(sw, 4, 3, cols)), a_host[4:7]
    )


def test_ctr_differs_from_stream(rng):
    seed = rng.bytes(32)
    a = prg.expand_seed(4, 100, seed, mode="stream")
    b = prg.expand_seed(4, 100, seed, mode="ctr")
    assert not np.array_equal(a, b)


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_round_trip_ctr_mode(backend, rng):
    db = generate_random_kv_database(400, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(
        seed, db, backend=backend, prg_mode="ctr", rng=rng
    )
    client = Client.setup(seed, hint, fparams, prg_mode="ctr")
    for key in list(db.keys())[:4]:
        while True:
            try:
                q = client.query(key)
                break
            except ArithmeticOverflowAddingQueryIndicator:
                continue
        assert client.process_response(key, server.respond(q)) == db[key]


def test_mode_mismatch_fails_closed(rng):
    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 32))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", prg_mode="ctr", rng=rng)
    client = Client.setup(seed, hint, fparams, prg_mode="stream")
    key = next(iter(db))
    while True:
        try:
            q = client.query(key)
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    with pytest.raises(Exception):
        client.process_response(key, server.respond(q))
