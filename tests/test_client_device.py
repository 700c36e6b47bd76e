"""Device-resident client engine: s . A on the MXU, exact vs host path."""

import numpy as np
import pytest

from chalametpir_tpu import Client, Server
from chalametpir_tpu.core import prg
from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator
from chalametpir_tpu.ops.client_device import DeviceQueryEngine
from chalametpir_tpu.params import LWE_DIMENSION
from chalametpir_tpu.utils import generate_random_kv_database


@pytest.mark.parametrize("prg_mode", ["stream", "ctr"])
def test_device_engine_matvec_exact(prg_mode, rng):
    m = 300
    seed = rng.bytes(32)
    a = prg.expand_seed(LWE_DIMENSION, m, seed, mode=prg_mode)
    if prg_mode == "ctr":
        eng = DeviceQueryEngine.from_seed_ctr(seed, m)
    else:
        eng = DeviceQueryEngine.from_host_matrix(a)
    codes = rng.integers(0, 3, size=LWE_DIMENSION).astype(np.int8)
    got = eng.matvec(codes)
    pos = a[codes == 1].sum(axis=0, dtype=np.uint64)
    neg = a[codes == 2].sum(axis=0, dtype=np.uint64)
    want = (pos - neg).astype(np.uint32)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("prg_mode", ["stream", "ctr"])
def test_device_client_round_trip(prg_mode, rng):
    db = generate_random_kv_database(400, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(
        seed, db, arity=3, backend="numpy", prg_mode=prg_mode, rng=rng
    )
    client = Client.setup(seed, hint, fparams, prg_mode=prg_mode, device=True)
    assert client.uses_device
    keys = list(db.keys())[:4]
    for key in keys:
        while True:
            try:
                q = client.query(key)
                break
            except ArithmeticOverflowAddingQueryIndicator:
                pass
        assert client.process_response(key, server.respond(q)) == db[key]


@pytest.mark.parametrize("device", [False, True])
def test_query_batch_round_trip(device, rng):
    db = generate_random_kv_database(400, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    client = Client.setup(seed, hint, fparams, device=device)

    keys = list(db.keys())[:5]
    queries = client.query_batch(keys)
    assert len(queries) == len(keys)
    for key, q in zip(keys, queries):
        assert client.process_response(key, server.respond(q)) == db[key]

    # duplicate keys and already-pending keys are rejected
    from chalametpir_tpu.errors import PendingQueryExistsForKey

    with pytest.raises(PendingQueryExistsForKey):
        client.query_batch([keys[0], keys[0]])
    client.query_batch([keys[0]])  # ok again after processing
    with pytest.raises(PendingQueryExistsForKey):
        client.query_batch([keys[0]])
