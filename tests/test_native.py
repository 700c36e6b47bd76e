"""Native C++ engine parity against the pure numpy/Python reference paths."""

import numpy as np
import pytest

native = pytest.importorskip("chalametpir_tpu.native.engine")

from chalametpir_tpu.core import codec, hashing, keccak
from chalametpir_tpu.core.filter import construct_filter, filter_geometry


def test_xof_parity():
    seed = bytes(range(32))
    py = keccak.TurboShake128()
    py.absorb(seed)
    py.finalize()
    assert native.turboshake128(seed, 1000) == py.squeeze(1000)


def test_xof_published_vector():
    assert native.turboshake128(b"", 32).hex() == (
        "1e415f1c5983aff2169217277d17bb538cd945a397ddec541f1ce41af2c1b74c"
    )


def test_xof_multiblock_absorb():
    msg = bytes(range(256)) * 3
    assert native.turboshake128(msg, 64) == keccak.turboshake128(msg, 64)


def test_hash_keys_parity(rng):
    keys = [rng.bytes(int(n)) for n in rng.integers(1, 200, size=64)]
    want = np.stack([hashing.hash_of_key(k) for k in keys])
    assert np.array_equal(native.hash_keys(keys), want)


def test_encode_rows_parity(rng):
    b, cols = 9, 120
    n = 32
    digests = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    values = [rng.bytes(int(x)) for x in rng.integers(1, 80, size=n)]
    assert np.array_equal(
        native.encode_rows(digests, values, b, cols),
        codec.encode_rows(digests, values, b, cols),
    )


def test_mix_row_mask_parity(rng):
    h = int(rng.integers(0, 1 << 64, dtype=np.uint64))
    cols = np.arange(100, dtype=np.uint64)
    want = (hashing.murmur64(np.uint64(h) + cols) & np.uint64(0x1FF)).astype(np.uint32)
    assert np.array_equal(native.mix_row_mask(h, 100, 0x1FF), want)


def test_ternary_matvec_parity(rng):
    k, m = 200, 333
    codes = rng.integers(0, 3, size=k).astype(np.int8)
    mat = rng.integers(0, 1 << 32, size=(k, m), dtype=np.uint32)
    pos = mat[codes == 1].sum(axis=0, dtype=np.uint64)
    neg = mat[codes == 2].sum(axis=0, dtype=np.uint64)
    want = (pos - neg).astype(np.uint32)
    assert np.array_equal(native.ternary_matvec(codes, mat), want)


@pytest.mark.parametrize("arity", [3, 4])
def test_peel_parity_with_python(arity, rng):
    # both engines must produce *valid* peel orders (not necessarily equal)
    n = 1 << 10
    digests = rng.integers(0, 1 << 64, size=(n, 4), dtype=np.uint64)
    seg_len, seg_cnt_len, num_fp = filter_geometry(arity, n)
    hashes = np.sort(hashing.mix256(digests, rng.bytes(32)))
    got = native.bff_peel(hashes, num_fp, arity, seg_len, seg_cnt_len)
    assert got is not None
    reverse_order, reverse_h = got
    assert sorted(reverse_order.tolist()) == sorted(hashes.tolist())
    assert (reverse_h < arity).all()


def test_construct_filter_uses_native(rng):
    # end-to-end through construct_filter (which dispatches to native)
    digests = rng.integers(0, 1 << 64, size=(512, 4), dtype=np.uint64)
    filt, reverse_order, reverse_h, key_index = construct_filter(digests, 3, 10, 100, rng)
    fused = hashing.mix256(digests, filt.seed)
    assert np.array_equal(fused[key_index], reverse_order)
