"""TurboSHAKE128 bit-exactness (reference: turboshake crate behavior,
binary_fuse_filter.rs:568-584, matrix.rs:541-558)."""

import hashlib

import numpy as np
import pytest

from chalametpir_tpu.core.keccak import (
    RATE,
    TurboShake128,
    keccak_p,
    turboshake128,
    turboshake128_batch,
)

# Published TurboSHAKE128 test vectors (draft-irtf-cfrg-kangarootwelve).
TS128_EMPTY_1F = bytes.fromhex(
    "1e415f1c5983aff2169217277d17bb538cd945a397ddec541f1ce41af2c1b74c"
)
# M = ptn(1) = b"\x00" (the draft's repeating 0x00..0xFA pattern, length 17^0).
TS128_PTN1_1F = bytes.fromhex(
    "55cedd6f60af7bb29a4042ae832ef3f58db7299f893ebb9247247d856958daa9"
)
# Last 32 of a 10032-byte squeeze of the empty message — pins the squeeze
# loop across ~60 rate blocks, far past any >336 B edge case.
TS128_EMPTY_1F_10032_LAST32 = bytes.fromhex(
    "a3b9b0385900ce761f22aed548e754da10a5242d62e8c658e3f3a923a7555607"
)


def test_published_vector():
    assert turboshake128(b"", 32) == TS128_EMPTY_1F


def test_published_vector_ptn1():
    assert turboshake128(b"\x00", 32) == TS128_PTN1_1F


def test_published_vector_long_squeeze():
    assert turboshake128(b"", 10032)[-32:] == TS128_EMPTY_1F_10032_LAST32


@pytest.mark.parametrize("msg_len", [0, 1, 31, 32, 167, 168, 169, 335, 336, 1000])
def test_sponge_machinery_vs_hashlib_shake128(msg_len):
    # SHAKE128 = the same sponge with the same 0x1F padding byte but the
    # 24-round permutation; cross-checking against hashlib validates
    # absorb/pad/squeeze and the full round-constant table.
    msg = (bytes(range(256)) * 4)[:msg_len]
    h = TurboShake128(nrounds=24)
    h.absorb(msg)
    h.finalize(0x1F)
    assert h.squeeze(64) == hashlib.shake_128(msg).digest(64)


def test_incremental_absorb_and_squeeze():
    msg = bytes(range(200))
    h = TurboShake128()
    h.absorb(msg[:13])
    h.absorb(msg[13:170])
    h.absorb(msg[170:])
    h.finalize()
    part = h.squeeze(10) + h.squeeze(200) + h.squeeze(1)
    assert part == turboshake128(msg, 211)


def test_batch_matches_streaming(rng):
    msgs = [rng.bytes(int(n)) for n in rng.integers(0, 3 * RATE, size=32)]
    max_len = max(len(m) for m in msgs)
    buf = np.zeros((len(msgs), max_len), np.uint8)
    for i, m in enumerate(msgs):
        buf[i, : len(m)] = np.frombuffer(m, np.uint8)
    lengths = np.array([len(m) for m in msgs])
    out = turboshake128_batch(buf, lengths, 32)
    for i, m in enumerate(msgs):
        assert out[i].tobytes() == turboshake128(m, 32)


def test_keccak_p_batch_consistency(rng):
    states = rng.integers(0, 1 << 64, size=(8, 25), dtype=np.uint64)
    batch = keccak_p(states)
    for i in range(8):
        assert np.array_equal(batch[i], keccak_p(states[i]))
