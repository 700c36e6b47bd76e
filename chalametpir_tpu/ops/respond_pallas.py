"""Pallas respond kernel: stream the bit-packed DB at HBM speed.

The XLA digit-plane respond (ops/respond.py) reads 2 bytes per DB
element. This kernel cuts HBM traffic to ~1.0-1.25 B/element for the
large-DB regimes (b <= 10) by streaming the packed layout of
ops/packed.py: a biased low-byte int8 plane (fed straight to the MXU)
plus a bit-packed high plane unpacked in VMEM with two VPU ops per
packed word. Replaces the role of the reference's fused
unpack-multiply-accumulate respond loop
(reference: chalametpir_common/src/matrix.rs:328-485) — but where the
CPU unpacks around scalar MACs, here the MXU never sees packed data at
all: the dot operands are materialised per-tile in VMEM.

Layout note: the high plane is packed **column-block interleaved** so
that the kernel's cheap `concatenate` of shifted fields lands columns in
natural order (field j of packed word t holds logical column j*PC + t).

Grid: one dimension over m-tiles; both product accumulators live in the
output blocks (same block for every grid step). int32 accumulation
wrap-around stays exact mod 2^32.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .digits import NUM_U32_DIGITS, recode_u32_jnp
from .packed import hi_bits, hi_pack_factor

LANE = 128
# m-rows per grid step. Bigger tiles amortise the per-step VPU unpack and
# control overhead: at the 2^20 headline config, 2048 scans ~8% faster
# than 512 (4.43 ms vs 4.79 ms per full-DB scan on v5e).
DEFAULT_TILE_K = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, donate_argnums=0)
def _write_rows(buf, chunk, r0):
    """Donated row-range write: lands an uploaded chunk in the
    pre-allocated plane without ever holding two copies."""
    import jax.numpy as jnp

    return jax.lax.dynamic_update_slice(buf, chunk, (r0, jnp.int32(0)))


@dataclass
class PallasDB:
    """Device-resident packed DB in the kernel's native layout."""

    lo: jax.Array  # (m_pad, c_pad) int8, biased low bytes
    hi: jax.Array | None  # (m_pad, pc) uint8, block-interleaved packed
    mat_elem_bit_len: int
    num_rows: int  # logical m
    num_cols: int  # logical c
    tile_k: int
    # bytes actually sent over the host link to build the planes (the
    # tight pack path ships unpadded chunks, so this is smaller than the
    # HBM footprint); 0 = built without a host upload (device-generated)
    shipped_bytes: int = 0

    @property
    def hbm_bytes(self) -> int:
        return self.lo.size + (self.hi.size if self.hi is not None else 0)


def build_pallas_db(
    mat: np.ndarray,
    mat_elem_bit_len: int,
    tile_k: int = DEFAULT_TILE_K,
    chunk_rows: int = 1 << 17,
    m_align: int | None = None,
    sharding=None,
) -> PallasDB:
    """(m, c) uint16/uint32 encoded DB -> packed device planes.

    Packing and upload are pipelined in row chunks: device_put dispatches
    asynchronously, so the tunnel drains chunk i while the host packs
    chunk i+1 — at GB scale the host link, not the pack pass, is the
    bottleneck.

    m_align (default tile_k) rounds the padded fingerprint dimension up —
    sharded serving passes model_shards * tile_k so every shard gets whole
    tiles; `sharding` places the planes straight onto a mesh."""
    try:
        from ..native import engine as _native
    except Exception:  # pragma: no cover - native build unavailable
        _native = None

    m, c = mat.shape
    m_pad = _round_up(m, m_align or tile_k)
    c_pad = _round_up(c, LANE)
    hb = hi_bits(mat_elem_bit_len)
    pack = hi_pack_factor(mat_elem_bit_len) if hb > 0 else 0
    bits = (8 // pack if pack > 1 else 8) if pack else 0

    import jax.numpy as jnp

    chunk_rows = _round_up(chunk_rows, tile_k)
    if sharding is not None:
        # sharded placement: build the full host planes and land them with
        # ONE sharded device_put each — chunk accumulation + concatenate
        # would hold ~2x the DB in HBM at peak (host RAM is the cheap
        # place for the staging copy)
        chunk_rows = m_pad
    # unsharded chunks ship a TIGHT lo (no zero columns/rows) and land in a
    # pre-allocated device buffer via donated dynamic_update_slice — the
    # host link is ~4 orders slower than an HBM copy, and accumulating
    # chunks for a concatenate would double the peak HBM footprint
    tight = _native is not None and mat.dtype == np.uint16 and sharding is None
    if tight:
        pc = (c_pad // pack if pack > 1 else c_pad) if hb > 0 else 0
        # padded rows hold biased -128 == VALUE ZERO, so they contribute
        # nothing for ANY query — the ctr hint folds multiply nonzero A
        # values against them (a zero-padded-queries-only invariant would
        # silently corrupt the hint)
        lo_dev = jnp.full((m_pad, c_pad), -128, jnp.int8)
        hi_dev = jnp.zeros((m_pad, pc), jnp.uint8) if hb > 0 else None
        shipped = 0
        for r0 in range(0, m, chunk_rows):
            rows_pad = min(chunk_rows, m_pad - r0)
            rows = min(rows_pad, m - r0)
            lo_host, hi_host = _native.build_packed_planes(
                mat[r0 : r0 + rows], rows_pad, c_pad, pack, bits, tight_lo=True
            )
            shipped += lo_host.nbytes
            lo_dev = _write_rows(lo_dev, jax.device_put(lo_host), r0)
            if hb > 0:
                shipped += hi_host.nbytes
                hi_dev = _write_rows(hi_dev, jax.device_put(hi_host), r0)
        return PallasDB(lo_dev, hi_dev, mat_elem_bit_len, m, c, tile_k,
                        shipped_bytes=shipped)

    lo_chunks, hi_chunks = [], []
    shipped = 0
    for r0 in range(0, m_pad, chunk_rows):
        rows_pad = min(chunk_rows, m_pad - r0)
        rows = max(0, min(rows_pad, m - r0))
        sub = mat[r0 : r0 + rows]
        if _native is not None and rows > 0:
            lo_host, hi_host = _native.build_packed_planes(sub, rows_pad, c_pad, pack, bits)
        else:
            # padded rows/cols hold biased -128 == value zero: exact for
            # any query, including the nonzero A slabs of the hint folds
            lo_host = np.full((rows_pad, c_pad), -128, np.int8)
            lo_host[:rows, :c] = ((sub & np.uint16(255)).astype(np.int16) - 128).astype(np.int8)
            hi_host = None
            if hb > 0:
                pc = c_pad // pack if pack > 1 else c_pad
                hi_full = np.zeros((rows_pad, c_pad), np.uint8)
                hi_full[:rows, :c] = (sub >> 8).astype(np.uint8)
                if pack == 1:
                    hi_host = hi_full
                else:
                    # block interleave: field j of word t <- logical col j*pc+t
                    hi_host = np.zeros((rows_pad, pc), np.uint8)
                    for j in range(pack):
                        hi_host |= hi_full[:, j * pc : (j + 1) * pc] << np.uint8(bits * j)
        lo_chunks.append(jax.device_put(lo_host, sharding))
        shipped += lo_host.nbytes
        if hb > 0:
            if hi_host is None:  # native pack==0 path never lands here
                pc = c_pad // pack if pack > 1 else c_pad
                hi_host = np.zeros((rows_pad, pc), np.uint8)
            hi_chunks.append(jax.device_put(hi_host, sharding))
            shipped += hi_host.nbytes

    lo_dev = lo_chunks[0] if len(lo_chunks) == 1 else jnp.concatenate(lo_chunks, axis=0)
    hi_dev = None
    if hi_chunks:
        hi_dev = hi_chunks[0] if len(hi_chunks) == 1 else jnp.concatenate(hi_chunks, axis=0)
    return PallasDB(lo_dev, hi_dev, mat_elem_bit_len, m, c, tile_k,
                    shipped_bytes=shipped)


def _kernel_with_hi(pack: int, bits: int, qd_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    qd = qd_ref[:]  # (QD, TK) int8
    p_lo = jnp.dot(qd, lo_ref[:], preferred_element_type=jnp.int32)
    hp = hi_ref[:].astype(jnp.int32)  # (TK, PC)
    if pack == 1:
        hi = hp.astype(jnp.int8)
    else:
        mask = (1 << bits) - 1
        parts = [((hp >> (bits * j)) & mask).astype(jnp.int8) for j in range(pack)]
        hi = jnp.concatenate(parts, axis=1)  # (TK, C) natural column order
    qh = qd_ref[: out_hi_ref.shape[0], :]  # digits 0..2 rows
    p_hi = jnp.dot(qh, hi, preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        out_lo_ref[:] = p_lo
        out_hi_ref[:] = p_hi

    @pl.when(i > 0)
    def _():
        out_lo_ref[:] = out_lo_ref[:] + p_lo
        out_hi_ref[:] = out_hi_ref[:] + p_hi


def _kernel_lo_only(qd_ref, lo_ref, out_lo_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    p_lo = jnp.dot(qd_ref[:], lo_ref[:], preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        out_lo_ref[:] = p_lo

    @pl.when(i > 0)
    def _():
        out_lo_ref[:] = out_lo_ref[:] + p_lo


@partial(jax.jit, static_argnames=("tile_k", "pack", "bits", "interpret"))
def _run_with_hi(qd, lo, hi, tile_k, pack, bits, interpret=False):
    import jax.experimental.pallas as pl

    qd_rows, m_pad = qd.shape
    c_pad = lo.shape[1]
    pc = hi.shape[1]
    qh_rows = qd_rows - qd_rows // NUM_U32_DIGITS  # 3Q of the 4Q digit rows
    grid = (m_pad // tile_k,)
    out_lo, out_hi = pl.pallas_call(
        partial(_kernel_with_hi, pack, bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qd_rows, tile_k), lambda i: (0, i)),
            pl.BlockSpec((tile_k, c_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile_k, pc), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((qd_rows, c_pad), lambda i: (0, 0)),
            pl.BlockSpec((qh_rows, c_pad), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qd_rows, c_pad), jnp.int32),
            jax.ShapeDtypeStruct((qh_rows, c_pad), jnp.int32),
        ],
        interpret=interpret,
    )(qd, lo, hi)
    return out_lo, out_hi


@partial(jax.jit, static_argnames=("tile_k", "interpret"))
def _run_lo_only(qd, lo, tile_k, interpret=False):
    import jax.experimental.pallas as pl

    qd_rows, m_pad = qd.shape
    c_pad = lo.shape[1]
    grid = (m_pad // tile_k,)
    return pl.pallas_call(
        _kernel_lo_only,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qd_rows, tile_k), lambda i: (0, i)),
            pl.BlockSpec((tile_k, c_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((qd_rows, c_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((qd_rows, c_pad), jnp.int32),
        interpret=interpret,
    )(qd, lo)


@partial(jax.jit, static_argnames=("m_pad",))
def _prepare_query_digits(queries_u32, m_pad):
    """(Q, m) uint32 -> digit-major (4Q padded to 32, m_pad) int8 plus the
    per-digit bias-correction sums 128 * sum_k q_i[k]."""
    q, m = queries_u32.shape
    qd = recode_u32_jnp(queries_u32)  # (4, Q, m)
    sums = jnp.sum(qd.astype(jnp.int32), axis=2)  # (4, Q)
    qd_flat = qd.reshape(NUM_U32_DIGITS * q, m)
    rows = _round_up(NUM_U32_DIGITS * q, 32)
    qd_pad = jnp.zeros((rows, m_pad), jnp.int8)
    qd_pad = qd_pad.at[: NUM_U32_DIGITS * q, :m].set(qd_flat)
    return qd_pad, sums


def respond_packed_core(
    queries_u32, lo, hi, mat_elem_bit_len: int, num_cols: int, tile_k: int,
    interpret: bool,
):
    """Traceable core: (Q, m) uint32 x (lo, hi) planes -> (Q, c) uint32.

    Takes the planes as ARGUMENTS so callers can wrap it in an outer jit
    without baking the (GB-scale, per-database) arrays into the program as
    constants — a captured array changes the program hash, which in this
    deployment means a fresh remote compile for every new database."""
    q, _ = queries_u32.shape
    m_pad = lo.shape[0]
    qd, sums = _prepare_query_digits(queries_u32, m_pad)

    if hi is None:
        out_lo = _run_lo_only(qd, lo, tile_k, interpret)
        out_hi = None
    else:
        pack = hi_pack_factor(mat_elem_bit_len)
        bits = 8 // pack if pack > 1 else 8
        out_lo, out_hi = _run_with_hi(qd, lo, hi, tile_k, pack, bits, interpret)

    return _combine(out_lo, out_hi, sums, q, num_cols)


def respond_batch_packed(queries_u32, db: PallasDB, interpret: bool | None = None):
    """(Q, m) uint32 queries x PallasDB -> (Q, c) uint32 responses."""
    if interpret is None:
        # Pallas has no CPU lowering; tests on the virtual CPU mesh run the
        # kernel through the interpreter
        interpret = jax.default_backend() == "cpu"
    q, m = queries_u32.shape
    if m != db.num_rows:
        raise ValueError(f"query length {m} != DB rows {db.num_rows}")
    return respond_packed_core(
        queries_u32, db.lo, db.hi, db.mat_elem_bit_len, db.num_cols, db.tile_k,
        interpret,
    )


def hint_fold_partial(
    g, lo, hi, mat_elem_bit_len: int, num_cols: int, tile_k: int,
    rgroup: int, interpret: bool,
):
    """One hint chunk-fold: A[:, chunk] . D[chunk] over packed planes.

    g: (k_pad, cc) uint32 — the A fingerprint-chunk slab, transposed so
    its rows are LWE rows (generated on device from the ctr seed,
    ops/prg_jax.expand_fp_slab_device). lo/hi: packed planes of the
    matching cc DB rows. Returns (k_pad, num_cols) uint32.

    The fold is the respond kernel with A rows as the query batch —
    split into `rgroup`-row groups so each Pallas call's blocks fit VMEM
    (k_pad rows at once would need a ~15 MB digit block)."""
    k_pad, cc = g.shape
    parts = []
    for r0 in range(0, k_pad, rgroup):
        parts.append(
            respond_packed_core(
                g[r0 : r0 + rgroup], lo, hi, mat_elem_bit_len, num_cols,
                tile_k, interpret,
            )
        )
    return jnp.concatenate(parts, axis=0)


@partial(jax.jit, static_argnames=("q", "c"))
def _combine(out_lo, out_hi, sums, q, c):
    """Undo the bias, apply digit shifts, fold to (Q, c) uint32."""
    p_lo = out_lo[: NUM_U32_DIGITS * q, :c].reshape(NUM_U32_DIGITS, q, c)
    p_lo = p_lo + (sums * 128)[:, :, None]
    acc = p_lo[0]
    for i in range(1, NUM_U32_DIGITS):
        acc = acc + (p_lo[i] << (8 * i))
    if out_hi is not None:
        p_hi = out_hi[: 3 * q, :c].reshape(3, q, c)
        for i in range(3):
            acc = acc + (p_hi[i] << (8 * (i + 1)))
    return acc.astype(jnp.uint32)
