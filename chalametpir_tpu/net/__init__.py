"""Transport: asyncio TCP server/client with the reference wire framing."""
