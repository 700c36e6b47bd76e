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
    # both engines must produce *valid* peel orders (not necessarily
    # equal). A single seed can legitimately stall the peel (that is why
    # construct_filter retries with fresh seeds, params.rs:10) — mirror
    # that contract instead of asserting one-shot success.
    n = 1 << 10
    digests = rng.integers(0, 1 << 64, size=(n, 4), dtype=np.uint64)
    seg_len, seg_cnt_len, num_fp = filter_geometry(arity, n)
    got = None
    for _ in range(20):
        hashes = np.sort(hashing.mix256(digests, rng.bytes(32)))
        got = native.bff_peel(hashes, num_fp, arity, seg_len, seg_cnt_len)
        if got is not None:
            break
    assert got is not None, "peel stalled for 20 independent seeds"
    reverse_order, reverse_h = got
    assert sorted(reverse_order.tolist()) == sorted(hashes.tolist())
    assert (reverse_h < arity).all()


def test_construct_filter_uses_native(rng):
    # end-to-end through construct_filter (which dispatches to native)
    digests = rng.integers(0, 1 << 64, size=(512, 4), dtype=np.uint64)
    filt, reverse_order, reverse_h, key_index = construct_filter(digests, 3, 10, 100, rng)
    fused = hashing.mix256(digests, filt.seed)
    assert np.array_equal(fused[key_index], reverse_order)


@pytest.mark.parametrize("arity", [3, 4])
def test_encode_assemble_fused_matches_separate(arity, rng):
    # the fused uint16 encode+assemble must equal the two-step uint32 path
    n, b = 400, 11
    keys = [rng.bytes(int(rng.integers(16, 33))) for _ in range(n)]
    values = [rng.bytes(int(rng.integers(1, 80))) for _ in range(n)]
    digests = hashing.hash_of_keys_batch(keys)
    filt, reverse_order, reverse_h, key_index = construct_filter(digests, arity, b, 100, rng)
    from chalametpir_tpu.core import codec

    cols = codec.encoded_row_width(max(len(v) for v in values), b)
    digest_bytes = np.ascontiguousarray(digests).view(np.uint8).reshape(n, 32)

    enc = native.encode_rows(
        digest_bytes[key_index], [values[i] for i in key_index], b, cols
    )
    mat32 = np.zeros((filt.num_fingerprints, cols), np.uint32)
    native.assemble_rows(
        mat32, enc, reverse_order, reverse_h, None, b,
        arity=arity, seg_len=filt.segment_length, seg_cnt_len=filt.segment_count_length,
    )

    mat16 = native.encode_assemble_rows16(
        digest_bytes, values, key_index, reverse_order, reverse_h, b, cols,
        filt.num_fingerprints, arity, filt.segment_length, filt.segment_count_length,
    )
    assert mat16.dtype == np.uint16
    assert np.array_equal(mat16, mat32.astype(np.uint16))


def test_chacha8_ternary_uniform_and_keyed():
    ent = bytes(range(32))
    a = native.chacha8_ternary(ent, 100_000)
    b = native.chacha8_ternary(ent, 100_000)
    assert np.array_equal(a, b)  # deterministic per key
    c = native.chacha8_ternary(bytes(32), 100_000)
    assert not np.array_equal(a, c)  # key actually matters
    assert set(np.unique(a).tolist()) == {0, 1, 2}
    counts = np.bincount(a, minlength=3) / a.size
    assert np.allclose(counts, 1 / 3, atol=0.01)  # ~uniform


def test_chacha8_block_known_vector():
    # djb's ChaCha8 test vector: 256-bit zero key, 64-bit zero IV,
    # keystream block 0 — the sampler's %3 map over those words must match.
    ks_hex = (
        "3E00EF2F895F40D67F5BB8E81F09A5A12C840EC3CE9A7F3B181BE188EF711A1E"
        "984CE172B9216F419F445367456D5619314A42A3DA86B001387BFDB80E0CFE42"
    )
    words = np.frombuffer(bytes.fromhex(ks_hex), "<u4")
    limit = 0xFFFFFFFF - (0xFFFFFFFF % 3)
    expected = [int(v) % 3 for v in words if int(v) < limit][:16]
    assert native.chacha8_ternary(bytes(32), 16).tolist() == expected


def test_build_packed_planes_out_reuse_matches_fresh(rng):
    """Reused (out=) pack buffers must produce byte-identical planes to
    fresh allocations — including the hi plane, which is OR-accumulated
    and must be rezeroed on reuse."""
    from chalametpir_tpu.native import engine

    m, c, c_pad, pack, bits = 96, 100, 128, 8, 1
    mats = [
        np.ascontiguousarray(
            rng.integers(0, 1 << 9, size=(m, c), dtype=np.uint16)
        )
        for _ in range(3)
    ]
    fresh = [
        engine.build_packed_planes(mt, m, c_pad, pack, bits, tight_lo=True)
        for mt in mats
    ]
    bufs = (None, None)
    for i, mt in enumerate(mats):
        bufs = engine.build_packed_planes(
            mt, m, c_pad, pack, bits, tight_lo=True, out=bufs
        )
        assert np.array_equal(bufs[0], fresh[i][0])
        assert np.array_equal(bufs[1], fresh[i][1])
    # shape-mismatched reuse is rejected, not silently corrupted
    import pytest as _pytest

    with _pytest.raises(ValueError):
        engine.build_packed_planes(
            mats[0][:, :64], m, 64, pack, bits, tight_lo=True, out=bufs
        )


def test_binding_boundary_validation(rng):
    """engine.py is the C trust boundary: geometry, peel codes, key_index,
    value lengths, seed lengths, and codes lengths are all used unchecked
    on the C side (OOB writes/reads there), so the bindings must reject
    inconsistent values with typed Python errors."""
    import pytest as _pytest

    from chalametpir_tpu.native import engine

    hashes = np.sort(rng.integers(1, 1 << 63, size=16, dtype=np.uint64))
    # geometry: non-power-of-two seg_len, short num_fp, bad multiples
    with _pytest.raises(ValueError):
        engine.bff_peel(hashes, 40, 3, 5, 10)
    with _pytest.raises(ValueError):
        engine.bff_peel(hashes, 10, 3, 8, 16)  # num_fp < row space
    with _pytest.raises(ValueError):
        engine.bff_peel(hashes, 48, 3, 8, 12)  # not a multiple

    digests = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    values = [b"ab", b"cd"]
    ki = np.array([0, 1], np.int64)
    ro = rng.integers(1, 1 << 63, size=2, dtype=np.uint64)
    good_rh = np.array([0, 1], np.uint8)
    # peel code out of range for arity
    with _pytest.raises(ValueError):
        engine.encode_assemble_rows16(
            digests, values, ki, ro, np.array([0, 200], np.uint8),
            10, 32, 48, 3, 8, 32,
        )
    # key_index out of range
    with _pytest.raises(ValueError):
        engine.encode_assemble_rows16(
            digests, values, np.array([0, 5], np.int64), ro, good_rh,
            10, 32, 48, 3, 8, 32,
        )
    # value too long for the cols*b row (would overflow the C scratch)
    with _pytest.raises(ValueError):
        engine.encode_assemble_rows16(
            digests, [b"ab", b"x" * 4096], ki, ro, good_rh,
            10, 32, 48, 3, 8, 32,
        )
    # chunk grid must cover the row space
    with _pytest.raises(ValueError):
        engine.assemble_plan(ro, good_rh, 3, 8, 32, 0, 4)
    with _pytest.raises(ValueError):
        engine.assemble_plan(ro, good_rh, 3, 8, 32, 8, 2)

    # short filter seed (C memcpys 32 bytes unconditionally)
    with _pytest.raises(ValueError):
        engine.mix256_scalar(np.zeros(4, np.uint64), b"short")
    with _pytest.raises(ValueError):
        engine.client_process_response_wire(b"k", b"short", b"x" * 16, 0, 4, 10, 0)
    # codes length must match the matrix rows
    with _pytest.raises(ValueError):
        engine.ternary_matvec(
            np.zeros(3, np.int8), np.zeros((5, 7), np.uint32)
        )


def test_encode_db_rejects_empty_values(rng):
    """Empty values encode but can never decode (the 0x81 marker must sit
    strictly after the digest) — the core encoder rejects them loudly,
    matching Server.setup's guard, so direct core users can't build a DB
    with permanently unretrievable entries."""
    import pytest as _pytest

    from chalametpir_tpu.core import encode_db

    with _pytest.raises(ValueError, match="0-byte"):
        encode_db.from_kv_database({b"k1": b"v", b"k2": b""}, 3, 10, 100, rng)
