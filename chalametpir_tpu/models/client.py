"""The PIR client: host-side, bit-exact with the reference wire protocol.

Equivalent of the reference Client (reference:
chalametpir_client/src/client.rs:13-283). Stays on the host on purpose —
the reference client targets browsers/WASM, so ours targets plain
CPython + numpy with no device dependency; queries it produces are
byte-compatible with any conforming server (including the Rust one) and
vice versa.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..core import codec, hashing, matrix_io, prg
from ..core.filter import BinaryFuseFilter, hash_batch
from ..errors import (
    ArithmeticOverflowAddingQueryIndicator,
    DecodedRowNotPrependedWithDigestOfKey,
    InvalidHintMatrix,
    InvalidResponseVector,
    PendingQueryDoesNotExistForKey,
    PendingQueryExistsForKey,
)
from ..params import LWE_DIMENSION, SEED_BYTE_LEN, query_indicator

try:
    from ..native import engine as _native
except Exception:  # pragma: no cover - native build unavailable
    _native = None


def _accelerator_present() -> bool:
    """True when JAX has a non-CPU backend to run the query matvec on."""
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no jax in a host-only deploy
        return False


@dataclass
class Query:
    """Pending-query state: the secret unblinding vector c = s . M
    (reference: client.rs:13-15)."""

    vec_c: np.ndarray


class Client:
    def __init__(
        self,
        pub_mat_a: np.ndarray | None,
        hint_mat_m: np.ndarray,
        filt: BinaryFuseFilter,
        device_engine=None,
    ):
        self._pub_mat_a = pub_mat_a
        self._hint_mat_m = hint_mat_m
        self._filter = filt
        self._engine = device_engine
        self._pending: dict[bytes, Query] = {}

    @classmethod
    def setup(
        cls,
        seed: bytes,
        hint_bytes: bytes,
        filter_param_bytes: bytes,
        prg_mode: str = "stream",
        device: bool | str = "auto",
    ) -> "Client":
        """Regenerate A from the seed, parse the hint
        (reference: client.rs:39-57). `prg_mode` must match the server's
        (see core/prg.py; "stream" is reference-compatible).

        `device` controls where A lives and where s . A runs:
        True -> TPU (in ctr mode A is generated on device and never
        crosses the host link; in stream mode the host XOF expands it once
        and uploads); False -> host numpy/native; "auto" -> TPU whenever an
        accelerator backend is present."""
        if len(seed) != SEED_BYTE_LEN:
            raise ValueError(f"seed must be {SEED_BYTE_LEN} bytes")
        filt = BinaryFuseFilter.from_bytes(filter_param_bytes)
        hint_mat_m = matrix_io.matrix_from_bytes(hint_bytes)
        if hint_mat_m.shape[0] != LWE_DIMENSION:
            raise InvalidHintMatrix()

        if device == "auto":
            device = _accelerator_present()
        if device:
            from ..ops.client_device import DeviceQueryEngine

            if prg_mode == "ctr":
                engine = DeviceQueryEngine.from_seed_ctr(seed, filt.num_fingerprints)
            else:
                a_host = prg.expand_seed(
                    LWE_DIMENSION, filt.num_fingerprints, seed, mode=prg_mode
                )
                engine = DeviceQueryEngine.from_host_matrix(a_host)
            return cls(None, hint_mat_m, filt, device_engine=engine)

        pub_mat_a = prg.expand_seed(LWE_DIMENSION, filt.num_fingerprints, seed, mode=prg_mode)
        return cls(pub_mat_a, hint_mat_m, filt)

    # -- query ---------------------------------------------------------------

    def query(self, key: bytes) -> bytes:
        """Build an encrypted query for `key`
        (reference: client.rs:84-194). Raises
        ArithmeticOverflowAddingQueryIndicator occasionally; callers retry
        (the fresh secret makes the retry independent)."""
        key = bytes(key)
        if key in self._pending:
            raise PendingQueryExistsForKey()

        secret_s = self._sample_ternary(LWE_DIMENSION)
        if self._engine is not None:
            # dispatch s.A on device, overlap the host-side error sampling
            # and unblinding matvec with the device dot + readback
            b_dev = self._engine.matvec_batch_async(secret_s[None, :])
            return self._finalize_query(key, secret_s, b_dev)
        b_base = self._ternary_matvec(secret_s, self._pub_mat_a)
        return self._finalize_query(key, secret_s, b_base)

    def query_batch(self, keys: list[bytes]) -> list[bytes]:
        """Build queries for several keys at once. On a device client all
        secrets ride one batched MXU matvec (A streams from HBM once per
        batch instead of once per key); keys whose indicator overflows are
        transparently retried with fresh randomness, preserving the
        single-query retry contract."""
        keys = [bytes(k) for k in keys]
        if len(set(keys)) != len(keys):
            raise PendingQueryExistsForKey()
        for key in keys:
            if key in self._pending:
                raise PendingQueryExistsForKey()

        codes = np.stack([self._sample_ternary(LWE_DIMENSION) for _ in keys])
        if self._engine is not None:
            b_batch = self._engine.matvec_batch(codes)
        else:
            b_batch = np.stack(
                [self._ternary_matvec(c, self._pub_mat_a) for c in codes]
            )
        out = []
        for i, key in enumerate(keys):
            try:
                out.append(self._finalize_query(key, codes[i], b_batch[i]))
            except ArithmeticOverflowAddingQueryIndicator:
                while True:
                    try:
                        out.append(self.query(key))
                        break
                    except ArithmeticOverflowAddingQueryIndicator:
                        continue
        return out

    def _finalize_query(self, key: bytes, secret_s: np.ndarray, b_base) -> bytes:
        """Add the error vector and the query indicator, record the
        pending unblinding vector (reference: client.rs:106-139). Raises
        the overflow error with no state change; callers retry with a
        fresh secret.

        b_base may be a host (m,) array or an in-flight device array (from
        matvec_batch_async) — all host-only work (error sampling, the s.M
        matvec, key hashing) runs before it is materialised, so it
        overlaps the device dot and readback."""
        m = self._filter.num_fingerprints
        error_e = self._sample_ternary_u32(m)
        vec_c = self._ternary_matvec(secret_s, self._hint_mat_m)

        digest = hashing.hash_of_key(key)
        fused = int(hashing.mix256(digest, self._filter.seed))

        b_host = np.asarray(b_base)
        if b_host.ndim == 2:  # async device result: (1, m_pad)
            b_host = b_host[0, :m]
        query_b = b_host.astype(np.uint32) + error_e
        rows = hash_batch(
            self._filter.arity,
            np.uint64(fused),
            self._filter.segment_length,
            self._filter.segment_count_length,
        )
        delta = query_indicator(self._filter.mat_elem_bit_len)
        for r in rows:
            r = int(r)
            total = int(query_b[r]) + delta
            if total > 0xFFFFFFFF:
                raise ArithmeticOverflowAddingQueryIndicator()
            query_b[r] = total

        self._pending[key] = Query(vec_c=vec_c)
        return matrix_io.matrix_to_bytes(query_b[None, :])

    # -- response ------------------------------------------------------------

    def process_response(self, key: bytes, response_bytes: bytes) -> bytes:
        """Decrypt, round, unmask, decode, and verify the digest prefix
        (reference: client.rs:209-275)."""
        key = bytes(key)
        pending = self._pending.get(key)
        if pending is None:
            raise PendingQueryDoesNotExistForKey()

        response = matrix_io.matrix_from_bytes(response_bytes)
        if response.shape[0] != 1 or response.shape[1] != pending.vec_c.shape[0]:
            raise InvalidResponseVector()

        b = self._filter.mat_elem_bit_len

        if _native is not None:
            # single native crossing: hash + fold + decrypt + decode +
            # digest check (the multi-call path costs ~5x in dispatch)
            try:
                result = _native.client_process_response(
                    key, self._filter.seed, response[0], pending.vec_c, b
                )
            finally:
                del self._pending[key]
            if result == -1:
                from ..errors import RowNotDecodable

                raise RowNotDecodable()
            if result == -2:
                raise DecodedRowNotPrependedWithDigestOfKey()
            return result

        # numpy fallback (no native engine)
        digest = hashing.hash_of_key(key)
        fused = int(hashing.mix256(digest, self._filter.seed))

        try:
            rounding_factor = np.uint32(query_indicator(b))
            rounding_floor = np.uint32(int(rounding_factor) // 2)
            mask = np.uint32((1 << b) - 1)
            unscaled = response[0] - pending.vec_c  # uint32 wrap
            scaled = unscaled // rounding_factor
            rem = unscaled % rounding_factor
            rounded = scaled + (rem > rounding_floor).astype(np.uint32)
            mask_row = hashing.row_mask(fused, response.shape[1], b)
            plaintext = ((rounded & mask) + mask_row) & mask
            kv = codec.decode_kv_from_row(plaintext, b)
        finally:
            # the reference removes the pending query on success and on
            # decode failure alike (client.rs:267)
            del self._pending[key]
        digest_bytes = np.asarray(digest).view(np.uint8).tobytes()
        if kv[:32] != digest_bytes:
            raise DecodedRowNotPrependedWithDigestOfKey()
        return kv[32:]

    # -- benchmarking hooks (reference: client.rs:60-71) -----------------------

    def discard_query(self, key: bytes) -> Query | None:
        return self._pending.pop(bytes(key), None)

    def insert_query(self, key: bytes, query: Query) -> None:
        self._pending[bytes(key)] = query

    # -- internals -------------------------------------------------------------

    @staticmethod
    def _sample_ternary(n: int) -> np.ndarray:
        """Uniform {0, 1, -1} as {0, 1, 2} codes from a CSPRNG — these are
        LWE encryption secrets, so a statistical RNG is not acceptable
        (reference samples from OS-entropy-keyed ChaCha8,
        matrix.rs:572-619; -1 is u32::MAX on the wire)."""
        entropy = os.urandom(32)
        if _native is not None:
            return _native.chacha8_ternary(entropy, n)
        # fallback: rejection-sample uniform ternary straight from OS
        # entropy (the final partial bucket of size 2^32 mod 3 is rejected)
        limit = np.uint32(0xFFFFFFFF - (0xFFFFFFFF % 3))
        out = np.empty(n, np.int8)
        filled = 0
        while filled < n:
            words = np.frombuffer(os.urandom(4 * (n - filled)), "<u4")
            words = words[words < limit]
            out[filled : filled + words.size] = (words % np.uint32(3)).astype(np.int8)
            filled += words.size
        return out

    def _sample_ternary_u32(self, n: int) -> np.ndarray:
        t = self._sample_ternary(n)
        out = np.zeros(n, dtype=np.uint32)
        out[t == 1] = 1
        out[t == 2] = 0xFFFFFFFF
        return out

    @property
    def uses_device(self) -> bool:
        return self._engine is not None

    @staticmethod
    def _ternary_matvec(t_codes: np.ndarray, mat: np.ndarray) -> np.ndarray:
        """(s . mat) mod 2^32 for ternary s — plus/minus row sums, no
        multiplies."""
        if _native is not None:
            return _native.ternary_matvec(t_codes, mat)
        pos = mat[t_codes == 1].sum(axis=0, dtype=np.uint64)
        neg = mat[t_codes == 2].sum(axis=0, dtype=np.uint64)
        return (pos - neg).astype(np.uint32)  # uint64 wrap == mod 2^32
