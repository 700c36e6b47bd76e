"""Public-matrix expansion: seed -> LWE matrix A via TurboSHAKE128 XOF.

The 32-byte seed is absorbed once and the XOF stream is read row-major
into uint32 little-endian elements (reference:
chalametpir_common/src/matrix.rs:541-558). The stream is a single
sequential sponge — it cannot be parallelised without breaking interop —
so the fast path is the native C++ engine; the pure-Python sponge is the
fallback for small matrices and tests.

`iter_row_blocks` exposes the stream as contiguous row blocks so the
server can pipeline: squeeze a block, ship it to the TPU, fold it into
the hint matmul, while the next block is being squeezed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .keccak import TurboShake128

try:
    from ..native import engine as _native
except Exception:  # pragma: no cover
    _native = None


class SeedStream:
    """Streaming XOF squeeze of the matrix byte stream."""

    def __init__(self, seed: bytes) -> None:
        if _native is not None:
            self._native = _native.XofStream(seed)
            self._py = None
        else:
            self._native = None
            self._py = TurboShake128()
            self._py.absorb(seed)
            self._py.finalize()

    def read_u32(self, count: int) -> np.ndarray:
        nbytes = count * 4
        if self._native is not None:
            return self._native.squeeze_u32(count)
        return np.frombuffer(self._py.squeeze(nbytes), dtype="<u4").copy()


def expand_seed(rows: int, cols: int, seed: bytes) -> np.ndarray:
    """Full (rows, cols) uint32 matrix A."""
    return SeedStream(seed).read_u32(rows * cols).reshape(rows, cols)


def iter_row_blocks(
    rows: int, cols: int, seed: bytes, block_rows: int
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (row_offset, (r, cols) uint32 block) covering A in order."""
    stream = SeedStream(seed)
    for r0 in range(0, rows, block_rows):
        r = min(block_rows, rows - r0)
        yield r0, stream.read_u32(r * cols).reshape(r, cols)
