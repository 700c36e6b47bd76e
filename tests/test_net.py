"""TCP transport round trip with reference framing
(reference: chalametpir_server/examples/server.rs, client examples)."""

import asyncio

import numpy as np
import pytest

from chalametpir_tpu.models.server import Server
from chalametpir_tpu.net.client import fetch
from chalametpir_tpu.net.server import DEMO_DB, PirTcpServer


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_tcp_round_trip(backend, rng):
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, DEMO_DB, backend=backend, rng=rng)
    tcp = PirTcpServer(server, seed, hint, fparams)

    async def run():
        srv = await asyncio.start_server(tcp.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        async with srv:
            results = await fetch("127.0.0.1", port, [b"banana", b"cherry", b"kiwi"])
        return results

    results = asyncio.run(run())
    assert results[b"banana"] == b"yellow"
    assert results[b"cherry"] == b"red"
    assert results[b"kiwi"] == b"brown"


def test_tcp_multiple_clients(rng):
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, DEMO_DB, backend="numpy", rng=rng)
    tcp = PirTcpServer(server, seed, hint, fparams)

    async def run():
        srv = await asyncio.start_server(tcp.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        async with srv:
            a, b = await asyncio.gather(
                fetch("127.0.0.1", port, [b"apple"]),
                fetch("127.0.0.1", port, [b"plum"]),
            )
        return a, b

    a, b = asyncio.run(run())
    assert a[b"apple"] == b"red"
    assert b[b"plum"] == b"purple"
