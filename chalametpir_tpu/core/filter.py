"""Binary fuse filter (3- and 4-wise XOR) construction and parameters.

Re-derivation of the reference's low-memory binary-fuse construction
(reference: chalametpir_common/src/binary_fuse_filter.rs:40-456):
bucket-sort the fused key hashes by segment, count slot degrees, then
peel degree-1 slots to obtain an insertion order. The peeled order and
per-key slot codes feed the DB matrix assembly in
`chalametpir_tpu.core.encode_db`.

The 68-byte parameter serialisation (seed || arity || segment_length ||
segment_count_length || num_fingerprints || filter_size ||
mat_elem_bit_len, all LE; usize fields are 8 bytes) is wire-compatible
with the reference (reference: binary_fuse_filter.rs:462-513).

Only the filter *parameters* travel on the wire — the construction
internals (placement order, peel order) are free to differ from the
reference as long as the algebraic encoding identity holds, which the
integration tests assert.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass

import numpy as np

from ..errors import (
    EmptyKVDatabase,
    ExhaustedAllAttemptsToBuildFilter,
    FailedToDeserializeFilterFromBytes,
    UnsupportedArityForBinaryFuseFilter,
)
from ..params import SEED_BYTE_LEN
from . import hashing

try:
    from ..native import engine as _native
except Exception:  # pragma: no cover - native build unavailable
    _native = None

_PARAM_STRUCT = struct.Struct("<32sIIIQQQ")


@dataclass
class BinaryFuseFilter:
    seed: bytes
    arity: int
    segment_length: int
    segment_count_length: int
    num_fingerprints: int
    filter_size: int
    mat_elem_bit_len: int

    def bits_per_entry(self) -> float:
        """(reference: binary_fuse_filter.rs:458-460)"""
        return self.num_fingerprints * self.mat_elem_bit_len / self.filter_size

    def to_bytes(self) -> bytes:
        return _PARAM_STRUCT.pack(
            self.seed,
            self.arity,
            self.segment_length,
            self.segment_count_length,
            self.num_fingerprints,
            self.filter_size,
            self.mat_elem_bit_len,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BinaryFuseFilter":
        if len(data) != _PARAM_STRUCT.size:
            raise FailedToDeserializeFilterFromBytes()
        seed, arity, seg_len, seg_cnt_len, num_fp, filt_size, bit_len = _PARAM_STRUCT.unpack(data)
        # semantic validation: these params come off the wire from the
        # server, and every later consumer (hash_batch's segment masks,
        # the query indicator add, the row codec) indexes with them
        # unchecked — a hostile or corrupt 68-byte blob must fail HERE
        # with the typed error, not as a raw IndexError deep in query()
        from ..params import MAX_CIPHER_TEXT_BIT_LEN, MIN_CIPHER_TEXT_BIT_LEN

        # STRUCTURAL geometry validation — every property a consumer
        # relies on, without requiring bit-equality with the locally
        # recomputed filter_geometry (whose log/floor expressions could
        # differ from a Rust peer's libm by 1 ULP at a floor boundary;
        # exact recomputation would hard-reject that peer's valid blob):
        #  * seg_len a power of two <= 2^18 and seg_cnt_len a positive
        #    multiple of it: with the num_fp identity these are exactly
        #    what hash_batch's index-bound proof needs (max row index =
        #    seg_cnt_len - 1 + (arity-1)*seg_len = num_fp - 1), so no
        #    blob can drive out-of-range rows -> IndexError in query()
        #  * num_fp commensurate with the claimed filter_size: by
        #    construction num_fp <= cap + arity*seg_len with
        #    cap <= size_factor*filt_size + 1 and size_factor < 7 for
        #    every size >= 2 (max at size 2), so a hostile blob cannot
        #    decouple num_fp from filt_size to inflate the client's
        #    matrix-A expansion (Client.setup additionally caps the
        #    absolute allocation)
        ok = (
            arity in (3, 4)
            and filt_size > 0
            and MIN_CIPHER_TEXT_BIT_LEN <= bit_len <= MAX_CIPHER_TEXT_BIT_LEN
            and 0 < seg_len <= (1 << 18)
            and (seg_len & (seg_len - 1)) == 0
            and seg_cnt_len >= seg_len
            and seg_cnt_len % seg_len == 0
            # geometry identity (binary_fuse_filter.rs:52-67)
            and num_fp == seg_cnt_len + (arity - 1) * seg_len
            and num_fp <= 7 * filt_size + arity * seg_len + 1
        )
        if not ok:
            raise FailedToDeserializeFilterFromBytes()
        return cls(seed, arity, seg_len, seg_cnt_len, int(num_fp), int(filt_size), int(bit_len))

    def hash_rows_of_key(self, key: bytes) -> tuple[int, np.ndarray]:
        """Fused hash and the arity row indices for one key."""
        hashed_key = hashing.hash_of_key(key)
        h = int(hashing.mix256(hashed_key, self.seed))
        rows = hash_batch(self.arity, np.uint64(h), self.segment_length, self.segment_count_length)
        return h, np.stack([r.reshape(()) for r in rows]).astype(np.uint32)


def segment_length(arity: int, size: int) -> int:
    """(reference: binary_fuse_filter.rs:519-529; the reference casts the
    float exponent with Rust `as u32`, which saturates negatives to 0 —
    at arity 4, size 1 the exponent is -1, so clamp instead of crashing
    on a negative shift)"""
    if size == 0:
        return 4
    if arity == 3:
        return 1 << max(0, int(math.floor(math.log(size) / math.log(3.33) + 2.25)))
    if arity == 4:
        return 1 << max(0, int(math.floor(math.log(size) / math.log(2.91) - 0.5)))
    return 65536


def size_factor(arity: int, size: int) -> float:
    """(reference: binary_fuse_filter.rs:532-538)"""
    if arity == 3:
        return max(1.125, 0.875 + 0.25 * math.log(1e6) / math.log(size))
    if arity == 4:
        return max(1.075, 0.77 + 0.305 * math.log(6e5) / math.log(size))
    return 2.0


def _round_half_away(x: float) -> int:
    """Rust f64::round() semantics: nearest integer, ties away from zero.
    Python's round() is banker's (ties to even) — for db_size*size_factor
    landing exactly on a half-integer the two disagree by 1, which can
    shift the segment count and desynchronize the filter geometry from a
    Rust peer's. Exact for non-negative x (our only inputs)."""
    f = math.floor(x)
    return f + 1 if x - f >= 0.5 else f


def filter_geometry(arity: int, db_size: int) -> tuple[int, int, int]:
    """(segment_length, segment_count_length, num_fingerprints) for a DB of
    `db_size` keys (reference: binary_fuse_filter.rs:52-67; rounding and
    the saturating f64->u32 capacity cast mirrored exactly)."""
    seg_len = min(segment_length(arity, db_size), 1 << 18)
    cap = (
        min(_round_half_away(db_size * size_factor(arity, db_size)), 0xFFFFFFFF)
        if db_size > 1
        else 0
    )
    # (size_factor is undefined at db_size == 1; the reference skips it too)
    init_segment_count = -(-cap // seg_len)
    array_len = init_segment_count * seg_len
    proposed = -(-array_len // seg_len)
    segment_count = 1 if proposed < arity else proposed - (arity - 1)
    num_fingerprints = (segment_count + arity - 1) * seg_len
    return seg_len, segment_count * seg_len, num_fingerprints


def hash_batch(arity: int, h, seg_len: int, seg_cnt_len: int):
    if arity == 3:
        return hashing.hash_batch_3(h, seg_len, seg_cnt_len)
    if arity == 4:
        return hashing.hash_batch_4(h, seg_len, seg_cnt_len)
    raise UnsupportedArityForBinaryFuseFilter()


def construct_filter(
    hashed_keys: np.ndarray,
    arity: int,
    mat_elem_bit_len: int,
    max_attempt_count: int,
    rng: np.random.Generator | None = None,
):
    """Build a binary fuse filter over pre-hashed keys.

    Arguments:
      hashed_keys: (n, 4) uint64 TurboSHAKE digests of the keys.

    Returns (filter, reverse_order, reverse_h, key_index_of_hash) where
      reverse_order: (n,) uint64 fused hashes in peel order,
      reverse_h:     (n,) uint8 slot code (which of the arity positions
                     was the degree-1 slot when the key was peeled),
      key_index:     (n,) int64 mapping peel order -> original key index.

    Mirrors reference: binary_fuse_filter.rs:40-456 (3- and 4-wise
    variants unified; construction order differs, validity does not).
    """
    n = hashed_keys.shape[0]
    if n == 0:
        raise EmptyKVDatabase()
    if arity not in (3, 4):
        raise UnsupportedArityForBinaryFuseFilter()

    seg_len, seg_cnt_len, num_fp = filter_geometry(arity, n)
    # a slot's u8 degree counter in the reference holds 4*degree, so the
    # usable degree range before overflow is bounded; treat exceeding it
    # as a failed attempt (reference: binary_fuse_filter.rs:144,362)
    max_degree = 31 if arity == 4 else 63

    for _ in range(max_attempt_count):
        seed = (rng.bytes(SEED_BYTE_LEN) if rng is not None else os.urandom(SEED_BYTE_LEN))
        hashes = hashing.mix256(hashed_keys, seed)
        # one sort per attempt: the argsort yields the segment-ordered
        # placement, the adjacent-equal scan is the uniqueness check
        # np.unique would have re-sorted for, and `order` is exactly the
        # key-index map needed on success
        order = np.argsort(hashes)
        ordered = hashes[order]  # segment-ordered placement
        if n > 1 and (ordered[1:] == ordered[:-1]).any():
            continue  # fused-hash collision: retry with a fresh seed
        if _native is not None:
            peel = _native.bff_peel(ordered, num_fp, arity, seg_len, seg_cnt_len)
        else:
            hrows = np.stack(hash_batch(arity, ordered, seg_len, seg_cnt_len)).astype(np.int64)
            count = np.zeros(num_fp, dtype=np.int64)
            np.add.at(count, hrows.reshape(-1), 1)
            if count.max() > max_degree:
                continue
            hxor = np.zeros(num_fp, dtype=np.uint64)
            pxor = np.zeros(num_fp, dtype=np.uint8)
            for pos in range(arity):
                np.bitwise_xor.at(hxor, hrows[pos], ordered)
                if pos:
                    np.bitwise_xor.at(pxor, hrows[pos], np.uint8(pos))
            peel = _peel(ordered, hrows, count, hxor, pxor, arity, seg_len, seg_cnt_len)
        if peel is None:
            continue
        reverse_order, reverse_h = peel

        filt = BinaryFuseFilter(
            seed=seed,
            arity=arity,
            segment_length=seg_len,
            segment_count_length=seg_cnt_len,
            num_fingerprints=num_fp,
            filter_size=n,
            mat_elem_bit_len=mat_elem_bit_len,
        )
        # map each peeled hash back to the original key index
        # (hashes[order] IS `ordered`; `order` computed once above)
        pos_of_hash = np.searchsorted(ordered, reverse_order)
        key_index = order[pos_of_hash]
        return filt, reverse_order, reverse_h, key_index

    raise ExhaustedAllAttemptsToBuildFilter(arity, max_attempt_count)


def _peel(hashes, hrows, count, hxor, pxor, arity, seg_len, seg_cnt_len):
    """Peel degree-1 slots; returns (reverse_order, reverse_h) or None.

    Sequential by nature (reference: binary_fuse_filter.rs:155-203); the
    native C++ engine replaces this loop for large databases.
    """
    n = hashes.shape[0]
    num_fp = count.shape[0]
    stack_h = np.empty(n, dtype=np.uint64)
    stack_code = np.empty(n, dtype=np.uint8)
    queue = np.flatnonzero(count == 1).tolist()
    top = 0
    count = count.copy()
    hxor = hxor.copy()
    pxor = pxor.copy()
    while queue:
        slot = queue.pop()
        if count[slot] != 1:
            continue
        h = hxor[slot]
        code = pxor[slot]
        stack_h[top] = h
        stack_code[top] = code
        top += 1
        rows = hash_batch(arity, h, seg_len, seg_cnt_len)
        for pos in range(arity):
            r = int(rows[pos])
            if pos == code:
                continue
            count[r] -= 1
            hxor[r] ^= h
            pxor[r] ^= np.uint8(pos)
            if count[r] == 1:
                queue.append(r)
    if top != n:
        return None
    return stack_h[:n], stack_code[:n]
