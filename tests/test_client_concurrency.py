"""Thread-safety contracts of the Client (the class supports
multithreaded use: thread-local decode buffers, a background auto-refill
thread, save() hardened against concurrent process_response).

The reference client is single-threaded (client.rs); these contracts are
this framework's own — pinned here so the reservation protocol in
Client._reserve_pending and the refill-loop lock discipline cannot
regress silently.
"""

import threading

import numpy as np
import pytest

from chalametpir_tpu import Client, Server
from chalametpir_tpu.errors import (
    ArithmeticOverflowAddingQueryIndicator,
    PendingQueryDoesNotExistForKey,
    PendingQueryExistsForKey,
)
from chalametpir_tpu.utils import generate_random_kv_database


@pytest.fixture(scope="module")
def pir_pair():
    rng = np.random.default_rng(0xC0C0)
    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 48))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    return db, seed, server, hint, fparams


def test_concurrent_same_key_query_exactly_one_wins(pir_pair):
    """Two threads racing query(k) on the same key: exactly one may
    succeed; the rest get PendingQueryExistsForKey. Before the atomic
    reservation, both could pass the check and the second insert
    silently overwrote the first Query's unblinding vector (undecodable
    responses instead of the typed error)."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False)
    key = next(iter(db))

    n = 8
    barrier = threading.Barrier(n)
    wins, rejects, errors = [], [], []

    def racer():
        barrier.wait()
        try:
            while True:
                try:
                    wins.append(client.query(key))
                    return
                except ArithmeticOverflowAddingQueryIndicator:
                    continue
        except PendingQueryExistsForKey:
            rejects.append(1)
        except BaseException as e:  # noqa: BLE001 - fail the test visibly
            errors.append(e)

    threads = [threading.Thread(target=racer) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(wins) == 1 and len(rejects) == n - 1
    # the winning query is genuinely usable
    assert client.process_response(key, server.respond(wins[0])) == db[key]


def test_failed_query_releases_reservation(pir_pair):
    """A query that raises must not leave its reservation behind: the
    key is immediately retryable, and process_response sees no pending
    entry for it."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False)
    key = sorted(db)[1]

    orig = client._add_query_indicator
    client._add_query_indicator = lambda *a: (_ for _ in ()).throw(
        ArithmeticOverflowAddingQueryIndicator()
    )
    with pytest.raises(ArithmeticOverflowAddingQueryIndicator):
        client.query(key)
    with pytest.raises(PendingQueryDoesNotExistForKey):
        client.process_response(key, b"\0" * 16)
    client._add_query_indicator = orig
    while True:
        try:
            q = client.query(key)
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    assert client.process_response(key, server.respond(q)) == db[key]


def test_double_process_response_typed_error(pir_pair):
    """Processing the same response twice raises the typed
    PendingQueryDoesNotExistForKey (get-then-del used to leak a bare
    KeyError under a concurrent consumer)."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False)
    key = sorted(db)[2]
    while True:
        try:
            q = client.query(key)
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    resp = server.respond(q)
    assert client.process_response(key, resp) == db[key]
    with pytest.raises(PendingQueryDoesNotExistForKey):
        client.process_response(key, resp)


def test_stop_refill_quiesces_background_thread(pir_pair):
    """stop_refill() joins the auto-refill thread and no further refills
    run; until then the refill keeps the pool at target across pops
    (including across the refill thread's own exit — the lost-wakeup
    regression)."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(
        seed, hint, fparams, device=False, prepared_queries=3,
        auto_refill=True,
    )
    keys = sorted(db)[:6]
    import time as _t

    for key in keys[:4]:
        while True:
            try:
                q = client.query(key)
                break
            except ArithmeticOverflowAddingQueryIndicator:
                continue
        assert client.process_response(key, server.respond(q)) == db[key]
        # the pool must come back to target after every pop
        deadline = _t.monotonic() + 30
        while client.prepared_query_count < 3 and _t.monotonic() < deadline:
            _t.sleep(0.02)
        assert client.prepared_query_count >= 3
    client.stop_refill()
    t = client._refill_thread
    assert t is None or not t.is_alive()
    # no new refill spawns after stop
    client._pop_prepared()
    assert client._refill_target == 0
    t = client._refill_thread
    assert t is None or not t.is_alive()


def test_refill_does_not_clobber_prepare_stats(pir_pair):
    """The background refill must not overwrite a foreground
    prepare_queries() caller's attribution stats."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False)
    client.prepare_queries(2)
    marker = dict(client.prepare_stats)
    assert marker.get("count") == 2
    # simulate what the refill loop runs
    client._prepare_queries(3, record_stats=False)
    assert client.prepare_stats == marker
    assert client.prepared_query_count == 5
