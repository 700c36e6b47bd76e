"""Filter hash family (reference: binary_fuse_filter.rs:553-635)."""

import numpy as np

from chalametpir_tpu.core import hashing


def _murmur64_oracle(h: int) -> int:
    m = (1 << 64) - 1
    h &= m
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & m
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & m
    h ^= h >> 33
    return h


def test_murmur64_scalar_vs_vector(rng):
    xs = rng.integers(0, 1 << 64, size=100, dtype=np.uint64)
    vec = hashing.murmur64(xs)
    for i, x in enumerate(xs):
        assert int(vec[i]) == _murmur64_oracle(int(x)) == hashing.murmur64(int(x))


def test_mix256_scalar_vs_batch(rng):
    hk = rng.integers(0, 1 << 64, size=(50, 4), dtype=np.uint64)
    seed = rng.bytes(32)
    batch = hashing.mix256(hk, seed)
    for i in range(50):
        assert int(hashing.mix256(hk[i], seed)) == int(batch[i])


def test_mix256_oracle():
    # independent reconstruction from the reference's formula
    hk = np.array([1, 2, 3, 4], np.uint64)
    seed = bytes(range(32))
    sw = np.frombuffer(seed, "<u8")
    total = 0
    for k in hk:
        acc = 0
        for w in sw:
            acc = _murmur64_oracle(acc + _murmur64_oracle((int(k) + int(w)) & ((1 << 64) - 1)))
        total = (total + acc) & ((1 << 64) - 1)
    assert int(hashing.mix256(hk, seed)) == total


def test_hash_batch_3_ranges_and_oracle(rng):
    seg_len, seg_cnt_len = 1 << 10, 7 << 10
    hs = rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)
    h0, h1, h2 = hashing.hash_batch_3(hs, seg_len, seg_cnt_len)
    num_fp = seg_cnt_len + 2 * seg_len
    assert (h0 < seg_cnt_len).all()
    assert (h1 < num_fp).all() and (h2 < num_fp).all()
    for i in range(20):
        h = int(hs[i])
        hi = (h * seg_cnt_len) >> 64
        e0 = hi & 0xFFFFFFFF
        e1 = (e0 + seg_len) ^ ((h >> 18) & (seg_len - 1))
        e2 = (e0 + 2 * seg_len) ^ (h & (seg_len - 1))
        assert (int(h0[i]), int(h1[i]), int(h2[i])) == (e0, e1, e2)


def test_hash_batch_4_oracle(rng):
    seg_len, seg_cnt_len = 1 << 8, 5 << 8
    hs = rng.integers(0, 1 << 64, size=200, dtype=np.uint64)
    h0, h1, h2, h3 = hashing.hash_batch_4(hs, seg_len, seg_cnt_len)
    for i in range(20):
        h = int(hs[i])
        e0 = ((h * seg_cnt_len) >> 64) & 0xFFFFFFFF
        e1 = (e0 + seg_len) ^ (h & (seg_len - 1))
        e2 = (e0 + 2 * seg_len) ^ ((h >> 16) & (seg_len - 1))
        e3 = (e0 + 3 * seg_len) ^ ((h >> 32) & (seg_len - 1))
        assert (int(h0[i]), int(h1[i]), int(h2[i]), int(h3[i])) == (e0, e1, e2, e3)
    # distinct rows per key (needed by the peeler)
    assert not np.any(h0 == h1) and not np.any(h1 == h2) and not np.any(h2 == h3)


def test_hash_of_keys_batch_matches_single(rng):
    keys = [rng.bytes(int(n)) for n in rng.integers(1, 33, size=16)]
    batch = hashing.hash_of_keys_batch(keys)
    for i, k in enumerate(keys):
        assert np.array_equal(batch[i], hashing.hash_of_key(k))
