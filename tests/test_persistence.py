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


def test_client_save_load_round_trip(rng, tmp_path):
    """A restarted client resumes with pending queries and the
    preprocessed pool intact — beyond the reference, whose only client
    state transfer is re-running setup (SURVEY.md section 5)."""
    db = generate_random_kv_database(400, rng=rng, value_byte_len=(8, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, arity=3, rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    client.prepare_queries(3)
    keys = list(db.keys())[:3]
    pending_q = {k: _query(client, k) for k in keys[:2]}

    path = str(tmp_path / "client.npz")
    client.save(path)
    restored = Client.load(path, device=False)

    # pending queries survive: the restarted client decrypts responses to
    # queries issued before the restart
    for k, q in pending_q.items():
        assert restored.process_response(k, server.respond(q)) == db[k]
    # the preprocessed pool is deliberately NOT persisted (pool entries
    # are one-time LWE encryptions; restoring a snapshot after any was
    # consumed would reuse query randomness on the wire and break query
    # privacy) — a fresh query after restart runs inline
    assert restored.prepared_query_count == 0
    k3 = keys[2]
    q3 = _query(restored, k3)
    assert restored.process_response(k3, server.respond(q3)) == db[k3]


def test_client_save_load_preserves_duplicate_guard(rng, tmp_path):
    db = generate_random_kv_database(300, rng=rng, value_byte_len=(8, 32))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, arity=3, rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    key = next(iter(db))
    _query(client, key)
    path = str(tmp_path / "client.npz")
    client.save(path)
    restored = Client.load(path, device=False)
    from chalametpir_tpu.errors import PendingQueryExistsForKey

    with pytest.raises(PendingQueryExistsForKey):
        restored.query(key)


def test_client_save_load_suffixless_path(rng, tmp_path):
    """np.savez(str) appends '.npz' to suffix-less paths; save/load must
    agree on the literal path the caller gave."""
    db = generate_random_kv_database(200, rng=rng, value_byte_len=(4, 16))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, arity=3, rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    key = next(iter(db))
    q = _query(client, key)
    path = str(tmp_path / "clientstate")  # no .npz suffix
    client.save(path)
    assert (tmp_path / "clientstate").exists()
    restored = Client.load(path, device=False)
    assert restored.process_response(key, server.respond(q)) == db[key]

    server.save(str(tmp_path / "serverstate"))  # same contract server-side
    assert (tmp_path / "serverstate").exists()
    s2 = Server.load(str(tmp_path / "serverstate"))
    assert s2.respond(q) == server.respond(q)
