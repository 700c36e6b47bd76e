"""Wire framing shared by the TCP example pair.

Identical to the reference examples' protocol
(reference: chalametpir_server/examples/server.rs:60-92,
chalametpir_client/examples/client.rs:19-70):

    server -> client:  seed (32 raw bytes)
                       u32 LE length || hint bytes
                       u32 LE length || filter param bytes
    client -> server:  u32 LE length || query bytes        (repeatable)
    server -> client:  u32 LE length || response bytes
"""

from __future__ import annotations

import asyncio
import struct

_LEN = struct.Struct("<I")
MAX_FRAME_LEN = 1 << 31  # sanity bound


async def read_frame(
    reader: asyncio.StreamReader, max_len: int = MAX_FRAME_LEN
) -> bytes:
    """Read one length-prefixed frame. `max_len` bounds the advertised
    length BEFORE any payload is buffered — a server reading queries
    passes its actual query size so a hostile peer cannot make it
    allocate gigabytes with a 4-byte header."""
    header = await reader.readexactly(_LEN.size)
    (length,) = _LEN.unpack(header)
    if length > max_len:
        raise ValueError(f"frame of {length} bytes exceeds limit {max_len}")
    return await reader.readexactly(length)


def write_frame(writer: asyncio.StreamWriter, payload: bytes) -> None:
    writer.write(_LEN.pack(len(payload)))
    writer.write(payload)
