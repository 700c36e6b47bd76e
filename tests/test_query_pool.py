"""FrodoPIR offline query preprocessing (the pool) and the wire-level
response path.

The (b = s.A + e, c = s.M) pair is key-independent, so FrodoPIR
(ia.cr/2022/981) prepares it before the query key is known; the
reference computes the same pair lazily inside query()
(reference: chalametpir_client/src/client.rs:106-107) and exposes
discard/insert hooks to bench the online remainder separately
(client.rs:60-71). These tests pin that a pooled query is
indistinguishable from an inline one at the protocol level.
"""

import time

import numpy as np
import pytest

from chalametpir_tpu import Client, Server
from chalametpir_tpu.errors import (
    ArithmeticOverflowAddingQueryIndicator,
    InvalidResponseVector,
    PendingQueryExistsForKey,
)
from chalametpir_tpu.utils import generate_random_kv_database


def _query_with_retry(client, key):
    while True:
        try:
            return client.query(key)
        except ArithmeticOverflowAddingQueryIndicator:
            continue


@pytest.fixture(scope="module")
def pir_pair():
    rng = np.random.default_rng(0x5EED)
    db = generate_random_kv_database(500, rng=rng, value_byte_len=(1, 96))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    return db, seed, server, hint, fparams


def test_pooled_queries_round_trip(pir_pair):
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=6)
    assert client.prepared_query_count == 6
    keys = list(db.keys())[:5]
    for key in keys:
        response = server.respond(_query_with_retry(client, key))
        assert client.process_response(key, response) == db[key]
    # 5 pops (unless an overflow retry burned extras) from 6 entries
    assert client.prepared_query_count <= 1


def test_pool_exhaustion_falls_back_inline(pir_pair):
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=1)
    keys = list(db.keys())[:3]
    for key in keys:  # 2 of the 3 must take the inline path
        response = server.respond(_query_with_retry(client, key))
        assert client.process_response(key, response) == db[key]
    assert client.prepared_query_count == 0


def test_query_batch_mixes_pool_and_inline(pir_pair):
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=2)
    keys = list(db.keys())[10:15]
    queries = client.query_batch(keys)
    assert len(queries) == len(keys)
    for key, q in zip(keys, queries):
        assert client.process_response(key, server.respond(q)) == db[key]


def test_pool_preserves_pending_contract(pir_pair):
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=3)
    key = next(iter(db))
    _query_with_retry(client, key)
    with pytest.raises(PendingQueryExistsForKey):
        client.query(key)


def test_malformed_response_keeps_pending(pir_pair):
    """A mis-shaped response errors WITHOUT consuming the pending query
    (reference: client.rs:210-217 returns early before the remove)."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False)
    key = next(iter(db))
    query = _query_with_retry(client, key)
    with pytest.raises(InvalidResponseVector):
        client.process_response(key, b"\x01\x00\x00\x00\x02\x00\x00\x00" + b"\0" * 8)
    # the pending state survived; the real response still decodes
    response = server.respond(query)
    assert client.process_response(key, response) == db[key]


def test_auto_refill_background(pir_pair):
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(
        seed, hint, fparams, device=False, prepared_queries=2, auto_refill=True
    )
    keys = list(db.keys())[20:24]
    for key in keys:
        response = server.respond(_query_with_retry(client, key))
        assert client.process_response(key, response) == db[key]
    # the refill thread must restore the pool to its target depth
    deadline = time.time() + 10.0
    while time.time() < deadline and client.prepared_query_count < 2:
        time.sleep(0.05)
    assert client.prepared_query_count >= 2


def test_query_inline_bypasses_pool(pir_pair):
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=2)
    key = list(db.keys())[30]
    while True:
        try:
            q = client.query_inline(key)
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    assert client.prepared_query_count == 2  # untouched
    assert client.process_response(key, server.respond(q)) == db[key]


def test_query_batch_overflow_retry_is_pool_neutral(pir_pair):
    """The batch's pool budget is decided once up front: an overflow
    retry recomputes inline and must NOT consume extra pool entries
    (pinned contract — see Client.query_batch docstring)."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=5)
    keys = list(db.keys())[50:53]

    orig = client._add_query_indicator
    forced = {"left": 2}  # force two overflows on the middle key

    def flaky(query_b, key):
        if key == keys[1] and forced["left"] > 0:
            forced["left"] -= 1
            raise ArithmeticOverflowAddingQueryIndicator()
        return orig(query_b, key)

    client._add_query_indicator = flaky
    queries = client.query_batch(keys)
    assert forced["left"] == 0  # both forced overflows actually fired
    # 3 batch slots = 3 pool pops; the 2 retries went inline, leaving 2
    # (an organic overflow can't change this: retries never touch the pool)
    assert client.prepared_query_count == 2
    for key, q in zip(keys, queries):
        assert client.process_response(key, server.respond(q)) == db[key]


def test_query_batch_unwinds_pending_on_retry_exhaustion(pir_pair):
    """If a key exhausts the overflow retry cap mid-batch, the caller
    never receives the earlier keys' query bytes — so those keys must
    NOT stay registered in _pending (they would be permanently stuck
    behind PendingQueryExistsForKey). The failed batch must be cleanly
    retryable once the fault clears."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=0)
    keys = list(db.keys())[60:63]

    orig = client._add_query_indicator
    fault = {"on": True}

    def always_overflows_middle(query_b, key):
        if fault["on"] and key == keys[1]:
            raise ArithmeticOverflowAddingQueryIndicator()
        return orig(query_b, key)

    client._add_query_indicator = always_overflows_middle
    with pytest.raises(ArithmeticOverflowAddingQueryIndicator):
        client.query_batch(keys)
    assert not any(k in client._pending for k in keys)

    fault["on"] = False  # fault cleared: the same batch simply retries
    queries = client.query_batch(keys)
    for key, q in zip(keys, queries):
        assert client.process_response(key, server.respond(q)) == db[key]


def test_auto_refill_query_batch_interleaving(pir_pair):
    """query_batch drains the pool through the same refill trigger as
    query(): after a batch empties it, the background thread restores the
    target depth, and interleaved batches keep round-tripping."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(
        seed, hint, fparams, device=False, prepared_queries=2, auto_refill=True
    )
    all_keys = list(db.keys())
    for lo in (60, 64):
        keys = all_keys[lo : lo + 4]  # 4 > pool target of 2
        queries = client.query_batch(keys)
        for key, q in zip(keys, queries):
            assert client.process_response(key, server.respond(q)) == db[key]
    deadline = time.time() + 10.0
    while time.time() < deadline and client.prepared_query_count < 2:
        time.sleep(0.05)
    assert client.prepared_query_count >= 2


def test_prepared_query_wire_format_matches_inline(pir_pair):
    """Pooled and inline queries must be shape- and protocol-identical:
    the server cannot tell them apart."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=1)
    keys = list(db.keys())[40:42]
    q_pool = _query_with_retry(client, keys[0])  # pool entry
    q_inline = _query_with_retry(client, keys[1])  # pool now empty
    assert len(q_pool) == len(q_inline)
    assert client.process_response(keys[0], server.respond(q_pool)) == db[keys[0]]
    assert client.process_response(keys[1], server.respond(q_inline)) == db[keys[1]]


def test_prepare_stats_attributes_the_batch(pir_pair):
    """prepare_queries must leave a phase split behind (prepare_stats):
    the bench fat record uses it to attribute pool-fill cost to host
    sampling vs the device b readback, so the contract is pinned here
    for the host path (device-path fields are covered by the hardware
    tier)."""
    db, seed, server, hint, fparams = pir_pair
    client = Client.setup(seed, hint, fparams, device=False, prepared_queries=0)
    assert client.prepare_stats == {}
    client.prepare_queries(3)
    stats = client.prepare_stats
    assert stats["count"] == 3
    assert stats["wall_s"] >= stats["host_s"] >= 0.0
    # host (no-engine) path computes b = s.A on the host and says so
    assert "host_matvec_s" in stats
    assert "readback_s" not in stats
    # a no-op call must not clobber the last real split
    client.prepare_queries(0)
    assert client.prepare_stats is stats
