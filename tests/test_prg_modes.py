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
    """ctr A is fingerprint-major: device fp slabs == host expansion."""
    import jax.numpy as jnp  # noqa: F401

    from chalametpir_tpu.ops import prg_jax

    seed = rng.bytes(32)
    sw = prg_jax.seed_to_words(seed)
    rows, cols = 9, 411
    a_host = prg.expand_seed(rows, cols, seed, mode="ctr")
    # full expansion: fp slab (cols, rows) == A transposed
    slab = np.asarray(prg_jax.expand_fp_slab_device(sw, 0, cols, rows))
    assert np.array_equal(slab.T, a_host)
    # a mid-range fingerprint slice generates exactly its own columns
    part = np.asarray(prg_jax.expand_fp_slab_device(sw, 100, 17, rows))
    assert np.array_equal(part.T, a_host[:, 100:117])
    # host fp-block helper agrees with the device slab
    host_blk = prg.expand_fp_block(rows, 100, 17, seed)
    assert np.array_equal(host_blk, part)


def test_ctr_iter_row_blocks_matches_full(rng):
    seed = rng.bytes(32)
    a = prg.expand_seed(13, 57, seed, mode="ctr")
    got = np.concatenate(
        [blk for _, blk in prg.iter_row_blocks(13, 57, seed, 4, mode="ctr")]
    )
    assert np.array_equal(got, a)


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


@pytest.mark.parametrize(
    "backend,layout",
    [("numpy", "auto"), ("jax", "digit2"), ("jax", "packed")],
)
def test_unknown_prg_mode_rejected(backend, layout, rng):
    """Every backend/layout path must fail closed on an unknown prg_mode
    (e.g. a typo like 'ctr ') instead of silently building a stream-mode
    hint that only surfaces as RowNotDecodable at retrieval time."""
    db = generate_random_kv_database(60, rng=rng, value_byte_len=(1, 16))
    with pytest.raises(ValueError, match="unknown prg mode"):
        Server.setup(
            rng.bytes(32), db, backend=backend, layout=layout,
            prg_mode="ctr ", rng=rng,
        )


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
