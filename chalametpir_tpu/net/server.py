"""asyncio TCP PIR server (reference: chalametpir_server/examples/server.rs).

Run: python -m chalametpir_tpu.net.server [--host 127.0.0.1] [--port 8080]

Serves a demo fruit database unless --random-db N is given. Each
connection receives the setup artifacts and may then stream any number
of length-framed queries. respond() calls are serialised through a
single worker so concurrent clients batch naturally onto the device.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

from ..models.server import Server
from ..params import SEED_BYTE_LEN
from .framing import read_frame, write_frame

DEMO_DB = {
    b"apple": b"red", b"banana": b"yellow", b"grape": b"purple",
    b"orange": b"orange", b"lemon": b"yellow", b"blueberry": b"blue",
    b"kiwi": b"brown", b"watermelon": b"green", b"strawberry": b"red",
    b"peach": b"pink", b"pineapple": b"yellow", b"cherry": b"red",
    b"avocado": b"green", b"plum": b"purple", b"cantaloupe": b"orange",
}


class PirTcpServer:
    def __init__(self, server: Server, seed: bytes, hint: bytes, filter_params: bytes):
        self._server = server
        self._seed = seed
        self._hint = hint
        self._filter_params = filter_params
        self._respond_lock = asyncio.Lock()

    async def handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        peer = writer.get_extra_info("peername")
        print(f"New connection from PIR client @ {peer}", file=sys.stderr)
        try:
            writer.write(self._seed)
            write_frame(writer, self._hint)
            write_frame(writer, self._filter_params)
            await writer.drain()
            while True:
                try:
                    query = await read_frame(reader)
                except (asyncio.IncompleteReadError, ConnectionResetError):
                    break
                async with self._respond_lock:
                    response = await asyncio.to_thread(self._server.respond, query)
                write_frame(writer, response)
                await writer.drain()
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except (ConnectionResetError, BrokenPipeError):
                pass

    async def serve(self, host: str, port: int):
        srv = await asyncio.start_server(self.handle, host, port)
        print(f"PIR Server listening @ {host}:{port}", file=sys.stderr)
        async with srv:
            await srv.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--arity", type=int, default=3, choices=(3, 4))
    ap.add_argument("--random-db", type=int, default=0, metavar="N",
                    help="serve a random N-entry database instead of the demo")
    ap.add_argument("--backend", default="auto", choices=("auto", "jax", "numpy"))
    args = ap.parse_args(argv)

    if args.random_db:
        from ..utils import generate_random_kv_database

        db = generate_random_kv_database(args.random_db)
    else:
        db = DEMO_DB

    seed = os.urandom(SEED_BYTE_LEN)
    server, hint, filter_params = Server.setup(seed, db, arity=args.arity, backend=args.backend)
    print(f"Setup done: {len(db)} entries, hint {len(hint)} B", file=sys.stderr)
    asyncio.run(PirTcpServer(server, seed, hint, filter_params).serve(args.host, args.port))


if __name__ == "__main__":
    main()
