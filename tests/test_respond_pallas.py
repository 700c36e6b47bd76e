"""Packed-layout Pallas respond kernel vs the host oracle (interpret mode
on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

from chalametpir_tpu.ops import packed
from chalametpir_tpu.ops.respond import respond_batch_np
from chalametpir_tpu.ops.respond_pallas import build_pallas_db, respond_batch_packed


@pytest.mark.parametrize("b", [4, 8, 9, 10, 12, 14])
def test_pack_roundtrip(b, rng):
    mat = rng.integers(0, 1 << b, size=(40, 37), dtype=np.uint32)
    db = packed.pack_db(mat, b)
    assert np.array_equal(packed.unpack_db(db), mat)
    expected_bpe = {4: 1.0, 8: 1.0, 9: 1.125, 10: 1.25, 12: 1.5, 14: 2.0}[b]
    assert db.bytes_per_element == pytest.approx(expected_bpe, rel=0.2)


@pytest.mark.parametrize("b", [9, 10, 12])
def test_pack_db_layout_matches_kernel(b, rng):
    """pack_db and build_pallas_db emit the SAME block-interleaved hi
    layout: a PackedDB's planes must be directly consumable by the
    Pallas kernel. Uses a lane-aligned geometry so the two builders'
    packed widths coincide; then compares the hi planes byte-for-byte
    and pins the kernel-style unpack (shift/mask each field, concatenate
    field blocks along columns) against the raw high bytes."""
    from chalametpir_tpu.ops.packed import hi_pack_factor

    m, c = 64, 256  # c a multiple of LANE=128 -> no column padding
    mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint32)
    host = packed.pack_db(mat, b)
    dev = build_pallas_db(mat, b, tile_k=64)
    hi_dev = np.asarray(dev.hi)[:m]
    assert np.array_equal(host.hi_packed, hi_dev)
    # kernel unpack (respond_pallas._kernel_with_hi): field j -> block j
    pack = hi_pack_factor(b)
    bits = 8 // pack if pack > 1 else 8
    mask = (1 << bits) - 1
    hp = host.hi_packed.astype(np.int32)
    unpacked = np.concatenate(
        [(hp >> (bits * j)) & mask for j in range(max(pack, 1))], axis=1
    )
    assert np.array_equal(unpacked[:, :c].astype(np.uint8), (mat >> 8).astype(np.uint8))


@pytest.mark.parametrize("b", [8, 9, 10, 12])
@pytest.mark.parametrize("q", [1, 5])
def test_respond_packed_exact(b, q, rng):
    m, c = 700, 150  # not multiples of the tile sizes
    queries = rng.integers(0, 1 << 32, size=(q, m), dtype=np.uint32)
    mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint32)
    db = build_pallas_db(mat, b, tile_k=256)
    got = np.asarray(respond_batch_packed(queries, db, interpret=True))
    assert np.array_equal(got, respond_batch_np(queries, mat))


def test_shipped_bytes_accounting(rng):
    """setup_stats prices upload GB/s off shipped_bytes — pin that the
    builder records what the link actually carried: positive, never more
    than the padded HBM planes, and strictly less on the tight native
    path (m=700/c=150 force both row and column padding)."""
    m, c, b = 700, 150, 9
    mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint16)
    db = build_pallas_db(mat, b, tile_k=256)
    assert 0 < db.shipped_bytes <= db.hbm_bytes
    try:
        from chalametpir_tpu.native import engine as _native  # noqa: F401
        tight = True
    except Exception:
        tight = False
    if tight:
        assert db.shipped_bytes < db.hbm_bytes
    # accounting must not perturb the kernel's answer
    queries = rng.integers(0, 1 << 32, size=(2, m), dtype=np.uint32)
    got = np.asarray(respond_batch_packed(queries, db, interpret=True))
    assert np.array_equal(got, respond_batch_np(queries, mat.astype(np.uint32)))


def test_respond_packed_exact_large_batch(rng):
    m, c, b = 512, 128, 9
    queries = rng.integers(0, 1 << 32, size=(16, m), dtype=np.uint32)
    mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint32)
    db = build_pallas_db(mat, b, tile_k=128)
    got = np.asarray(respond_batch_packed(queries, db, interpret=True))
    assert np.array_equal(got, respond_batch_np(queries, mat))
