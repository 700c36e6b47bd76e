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


async def read_frame(reader: asyncio.StreamReader) -> bytes:
    header = await reader.readexactly(_LEN.size)
    (length,) = _LEN.unpack(header)
    if length > MAX_FRAME_LEN:
        raise ValueError(f"frame of {length} bytes exceeds limit")
    return await reader.readexactly(length)


def write_frame(writer: asyncio.StreamWriter, payload: bytes) -> None:
    writer.write(_LEN.pack(len(payload)))
    writer.write(payload)
