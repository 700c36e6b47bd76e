"""Server state save/load: a restarted process resumes serving."""

import numpy as np
import pytest

from chalametpir_tpu import Client, Server
from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator
from chalametpir_tpu.utils import generate_random_kv_database


def _query(client, key):
    while True:
        try:
            return client.query(key)
        except ArithmeticOverflowAddingQueryIndicator:
            continue


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_save_load_round_trip(backend, rng, tmp_path):
    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend=backend, rng=rng)

    path = str(tmp_path / "server_state.npz")
    server.save(path)
    restored = Server.load(path)

    client = Client.setup(seed, hint, fparams)
    key = next(iter(db))
    q = _query(client, key)
    # byte-identical responses from the original and the restored server
    assert restored.respond(q) == server.respond(q)
    assert client.process_response(key, restored.respond(q)) == db[key]


def test_save_load_from_sharded_server(rng, tmp_path):
    """A mesh-sharded server's state can be saved and resumed on a single
    device (the planes gather on save)."""
    import jax

    from chalametpir_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, model=4)

    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, mesh=mesh, rng=rng)

    path = str(tmp_path / "sharded_state.npz")
    server.save(path)
    restored = Server.load(path)
    assert restored._mesh is None  # resumes as a single-device server

    client = Client.setup(seed, hint, fparams)
    key = next(iter(db))
    q = _query(client, key)
    assert restored.respond(q) == server.respond(q)
    assert client.process_response(key, restored.respond(q)) == db[key]
