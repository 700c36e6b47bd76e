"""Binary fuse filter construction and serde
(reference: binary_fuse_filter.rs, matrix.rs:1488-1518)."""

import numpy as np
import pytest

from chalametpir_tpu.core import filter, hashing
from chalametpir_tpu.core.filter import (
    BinaryFuseFilter,
    construct_filter,
    filter_geometry,
    hash_batch,
    segment_length,
    size_factor,
)
from chalametpir_tpu.errors import (
    EmptyKVDatabase,
    FailedToDeserializeFilterFromBytes,
)


def test_sizing_formulas():
    # spot values recomputed from the reference formulas
    # (binary_fuse_filter.rs:519-538)
    assert segment_length(3, 1 << 10) == 1 << 8  # floor(ln 1024/ln 3.33 + 2.25) = 8
    assert segment_length(4, 1 << 10) == 1 << 5  # floor(ln 1024/ln 2.91 - 0.5) = 5
    assert size_factor(3, 1 << 20) == pytest.approx(max(1.125, 0.875 + 0.25 * np.log(1e6) / np.log(1 << 20)))
    assert size_factor(4, 1 << 16) == pytest.approx(max(1.075, 0.77 + 0.305 * np.log(6e5) / np.log(1 << 16)))


def test_segment_length_saturates_tiny_sizes():
    """The reference casts the float exponent with Rust `as u32`, which
    saturates negatives to 0 — at arity 4, size 1 the exponent is -1
    (a negative shift crashed here before). Every size must yield a
    positive power of two."""
    for arity in (3, 4):
        for size in (1, 2, 3, 4, 7):
            sl = segment_length(arity, size)
            assert sl >= 1 and (sl & (sl - 1)) == 0
    assert segment_length(4, 1) == 1


@pytest.mark.parametrize("arity", [3, 4])
@pytest.mark.parametrize("n", [1, 2, 3])
def test_tiny_db_round_trip(arity, n, rng):
    """Single-digit DBs build and serve at both arities (arity 4, n=1
    regression: segment_length must saturate, not crash)."""
    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator

    db = {f"k{i}".encode(): f"value-{i}".encode() for i in range(n)}
    seed = bytes(32)
    server, hint, fp = Server.setup(
        seed, db, arity=arity, backend="numpy", rng=np.random.default_rng(0)
    )
    client = Client.setup(seed, hint, fp, device=False)
    while True:
        try:
            q = client.query(b"k0")
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    assert client.process_response(b"k0", server.respond(q)) == db[b"k0"]


@pytest.mark.parametrize("arity", [3, 4])
def test_construction_covers_all_keys(arity, rng):
    n = 1 << 11
    digests = rng.integers(0, 1 << 64, size=(n, 4), dtype=np.uint64)
    filt, reverse_order, reverse_h, key_index = construct_filter(digests, arity, 10, 100, rng)
    assert filt.filter_size == n
    assert len(reverse_order) == n
    assert sorted(key_index.tolist()) == list(range(n))
    assert (reverse_h < arity).all()
    # each peeled hash really is the fused hash of its key
    fused = hashing.mix256(digests, filt.seed)
    assert np.array_equal(fused[key_index], reverse_order)
    # peel validity: walking the peel order backwards, the found slot of
    # each key must not be touched by any key peeled before it
    rows = np.stack(hash_batch(arity, reverse_order, filt.segment_length, filt.segment_count_length))
    found_rows = rows[reverse_h, np.arange(n)]
    seen = np.zeros(filt.num_fingerprints, bool)
    for i in range(n - 1, -1, -1):
        assert not seen[found_rows[i]]
        seen[rows[:, i]] = True


@pytest.mark.parametrize("arity,bpe_factor", [(3, 1.13), (4, 1.08)])
def test_bits_per_entry_close_to_paper(arity, bpe_factor, rng):
    # reference asserts ~1.13*b (arity 3) / ~1.08*b (arity 4) on a 10^6
    # DB (matrix.rs:1488-1518) — same scale here (native peel makes the
    # million-key construction a couple of seconds)
    n = 1_000_000
    b = 10
    digests = rng.integers(0, 1 << 64, size=(n, 4), dtype=np.uint64)
    filt, *_ = construct_filter(digests, arity, b, 100, rng)
    assert filt.bits_per_entry() < bpe_factor * b * 1.01


def test_empty_db_rejected(rng):
    with pytest.raises(EmptyKVDatabase):
        construct_filter(np.zeros((0, 4), np.uint64), 3, 10, 100, rng)


def test_param_serde_roundtrip(rng):
    seg_len, seg_cnt_len, num_fp = filter.filter_geometry(4, 100000)
    filt = BinaryFuseFilter(
        seed=rng.bytes(32),
        arity=4,
        segment_length=seg_len,
        segment_count_length=seg_cnt_len,
        num_fingerprints=num_fp,
        filter_size=100000,
        mat_elem_bit_len=9,
    )
    blob = filt.to_bytes()
    assert len(blob) == 68  # reference wire size (README.md:33)
    assert BinaryFuseFilter.from_bytes(blob) == filt


def test_param_serde_rejects_bad_length():
    with pytest.raises(FailedToDeserializeFilterFromBytes):
        BinaryFuseFilter.from_bytes(b"\0" * 67)


def test_param_serde_rejects_hostile_values(rng):
    """The 68-byte params come off the wire from the server; every later
    consumer indexes with them unchecked, so corruption must surface as
    the typed error at parse time, not an IndexError inside query().
    from_bytes enforces the STRUCTURAL geometry contract (power-of-two
    seg_len, seg_cnt_len a multiple, the num_fp identity, num_fp
    commensurate with filter_size) — every property the index-bound
    proof and the client's allocation bound rely on, without requiring
    bit-equality with the locally recomputed float-log geometry (a Rust
    peer's libm may differ by 1 ULP at a floor boundary)."""
    seg_len, seg_cnt_len, num_fp = filter.filter_geometry(3, 5000)
    good = BinaryFuseFilter(
        seed=rng.bytes(32),
        arity=3,
        segment_length=seg_len,
        segment_count_length=seg_cnt_len,
        num_fingerprints=num_fp,
        filter_size=5000,
        mat_elem_bit_len=10,
    )
    assert BinaryFuseFilter.from_bytes(good.to_bytes()) == good
    for mutate in (
        dict(arity=5),
        dict(segment_length=0),
        dict(segment_count_length=0),
        dict(filter_size=0),
        dict(mat_elem_bit_len=3),
        dict(mat_elem_bit_len=15),
        dict(num_fingerprints=good.num_fingerprints + 1),
        # non-power-of-two seg_len satisfying the bare num_fp identity:
        # hash_batch's index-bound proof (max row = num_fp - 1) fails,
        # yielding out-of-range rows -> IndexError deep in query()
        dict(segment_length=5, segment_count_length=10,
             num_fingerprints=10 + 2 * 5, filter_size=20),
        # identity-consistent but inflated geometry decoupled from
        # filter_size: would drive a multi-TB matrix-A expansion
        dict(segment_length=1 << 18,
             segment_count_length=(1 << 31),
             num_fingerprints=(1 << 31) + 2 * (1 << 18)),
        # seg_len above the construction cap (2^18)
        dict(segment_length=1 << 20, segment_count_length=1 << 22,
             num_fingerprints=(1 << 22) + 2 * (1 << 20),
             filter_size=1 << 22),
    ):
        bad = BinaryFuseFilter(**{**good.__dict__, **mutate})
        with pytest.raises(FailedToDeserializeFilterFromBytes):
            BinaryFuseFilter.from_bytes(bad.to_bytes())


def test_param_serde_tolerates_peer_libm_drift(rng):
    """Interop guarantee: a peer whose libm puts segment_length one
    power-of-two step off our recomputation (1-ULP log drift at a floor
    boundary) still produces a STRUCTURALLY valid blob — from_bytes must
    accept it (exact recomputation would hard-reject a valid Rust
    server), and hash_batch's rows stay in range."""
    filt_size = 5000
    seg_len, _, _ = filter.filter_geometry(3, filt_size)
    for drifted in (seg_len // 2, seg_len * 2):
        # rebuild the downstream geometry the way construction would
        # from the drifted seg_len (cap unchanged)
        cap = filter._round_half_away(
            filt_size * filter.size_factor(3, filt_size)
        )
        init = -(-cap // drifted)
        proposed = init  # array_len // seg_len == init by construction
        seg_cnt = 1 if proposed < 3 else proposed - 2
        blob = BinaryFuseFilter(
            seed=rng.bytes(32), arity=3, segment_length=drifted,
            segment_count_length=seg_cnt * drifted,
            num_fingerprints=(seg_cnt + 2) * drifted,
            filter_size=filt_size, mat_elem_bit_len=10,
        ).to_bytes()
        parsed = BinaryFuseFilter.from_bytes(blob)
        h, rows = parsed.hash_rows_of_key(b"drift-key")
        assert (rows < parsed.num_fingerprints).all()


def test_round_half_away_matches_rust():
    """filter_geometry's capacity round mirrors Rust f64::round() (ties
    away from zero), NOT Python round() (banker's): at db_size*factor
    landing exactly on .5 the two differ by 1, which can shift the
    segment count and desynchronize the geometry from a Rust peer."""
    assert filter._round_half_away(2.5) == 3  # Python round(2.5) == 2
    assert filter._round_half_away(3.5) == 4
    assert filter._round_half_away(2.4999999999999996) == 2
    assert filter._round_half_away(1125004.5) == 1125005  # 1000004 * 1.125
    # the saturating f64 -> u32 cast: huge claimed sizes cap, not wrap
    g = filter.filter_geometry(3, 0xFFFFFFFF)
    assert g[2] <= 0xFFFFFFFF + 2 * (1 << 18) + (1 << 18)
