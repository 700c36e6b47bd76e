"""Full client <-> server round trips (reference: integrations/src/test_pir.rs)."""

import numpy as np
import pytest

from chalametpir_tpu import Client, Server
from chalametpir_tpu.errors import (
    ArithmeticOverflowAddingQueryIndicator,
    DecodedRowNotPrependedWithDigestOfKey,
    PendingQueryDoesNotExistForKey,
    PendingQueryExistsForKey,
)
from chalametpir_tpu.utils import generate_random_kv_database


def _query_with_retry(client, key):
    # the only tolerated failure is the query-indicator overflow, which is
    # retried with fresh randomness (reference: test_pir.rs:67-74)
    while True:
        try:
            return client.query(key)
        except ArithmeticOverflowAddingQueryIndicator:
            continue


@pytest.mark.parametrize("arity", [3, 4])
@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_round_trip(arity, backend, rng):
    n = int(rng.integers(1 << 8, 1 << 10))
    db = generate_random_kv_database(n, rng=rng, value_byte_len=(1, 128))
    seed = rng.bytes(32)

    server, hint, fparams = Server.setup(seed, db, arity=arity, backend=backend, rng=rng)
    client = Client.setup(seed, hint, fparams)

    keys = list(db.keys())
    for idx in rng.integers(0, n, size=6):
        key = keys[int(idx)]
        response = server.respond(_query_with_retry(client, key))
        assert client.process_response(key, response) == db[key]


def test_batched_respond_matches_single(rng):
    db = generate_random_kv_database(400, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="jax", rng=rng)
    client = Client.setup(seed, hint, fparams)

    from chalametpir_tpu.core import matrix_io

    keys = list(db.keys())[:4]
    queries = [matrix_io.matrix_from_bytes(_query_with_retry(client, k))[0] for k in keys]
    batch_out = server.respond_batch(np.stack(queries))
    for i, k in enumerate(keys):
        value = client.process_response(k, matrix_io.matrix_to_bytes(batch_out[i][None, :]))
        assert value == db[k]


def test_pending_query_statefulness(rng):
    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 32))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    client = Client.setup(seed, hint, fparams)
    key = next(iter(db))

    query = _query_with_retry(client, key)
    with pytest.raises(PendingQueryExistsForKey):
        client.query(key)

    with pytest.raises(PendingQueryDoesNotExistForKey):
        client.process_response(b"other-key", b"\0" * 16)

    response = server.respond(query)
    assert client.process_response(key, response) == db[key]
    # consumed: a second process_response must fail
    with pytest.raises(PendingQueryDoesNotExistForKey):
        client.process_response(key, response)


def test_response_for_wrong_key_rejected(rng):
    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 32))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    client = Client.setup(seed, hint, fparams)
    keys = list(db.keys())[:2]

    qa = _query_with_retry(client, keys[0])
    qb = _query_with_retry(client, keys[1])
    resp_b = server.respond(qb)
    # feeding key A's pending state with key B's response must fail the
    # digest check (or the decode), never return a wrong value
    with pytest.raises(Exception) as exc_info:
        client.process_response(keys[0], resp_b)
    assert exc_info.type.__name__ in (
        "RowNotDecodable",
        "DecodedRowNotPrependedWithDigestOfKey",
    )
    resp_a = server.respond(qa)
    # key A's own pending state was consumed by the failed attempt
    # (mirrors the reference's remove-on-any-outcome semantics)
    with pytest.raises(PendingQueryDoesNotExistForKey):
        client.process_response(keys[0], resp_a)


def test_interop_artifact_sizes(rng):
    # communication sizes must follow the reference formulas
    db = generate_random_kv_database(256, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    assert len(fparams) == 68
    from chalametpir_tpu.core import matrix_io
    from chalametpir_tpu.params import LWE_DIMENSION

    hint_mat = matrix_io.matrix_from_bytes(hint)
    assert hint_mat.shape == (LWE_DIMENSION, server.num_response_cols)

    client = Client.setup(seed, hint, fparams)
    key = next(iter(db))
    q = _query_with_retry(client, key)
    assert len(q) == 8 + 4 * server.num_query_cols
    r = server.respond(q)
    assert len(r) == 8 + 4 * server.num_response_cols


def test_client_secret_sampler_is_csprng():
    # the LWE secret must come from OS-entropy-keyed ChaCha (or raw OS
    # entropy), never a statistical RNG — guard the module against
    # regressions to np.random for the secret path
    import inspect

    import chalametpir_tpu.models.client as client_mod

    src = inspect.getsource(client_mod)
    assert "default_rng" not in src

    a = client_mod.Client._sample_ternary(50_000)
    b = client_mod.Client._sample_ternary(50_000)
    assert not np.array_equal(a, b)  # fresh entropy per call
    assert set(np.unique(a).tolist()) <= {0, 1, 2}
    counts = np.bincount(a, minlength=3) / a.size
    assert np.allclose(counts, 1 / 3, atol=0.02)


def test_protocol_works_without_jax():
    """The reference ships a wasm client that runs without its native
    accelerator stack; our analogue is that the host protocol (numpy
    server backend + host client) must work with jax entirely absent.
    Run a round trip in a subprocess where importing jax raises."""
    import subprocess
    import sys

    code = r"""
import sys

class _Block:
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith("jax."):
            raise ImportError("jax blocked for this test")
        return None

sys.meta_path.insert(0, _Block())

import numpy as np
from chalametpir_tpu import Client, Server
from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator
from chalametpir_tpu.utils import generate_random_kv_database

rng = np.random.default_rng(5)
db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 64))
seed = rng.bytes(32)
server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
client = Client.setup(seed, hint, fparams, device=False)
key = list(db)[7]
while True:
    try:
        q = client.query(key)
        break
    except ArithmeticOverflowAddingQueryIndicator:
        pass
assert client.process_response(key, server.respond(q)) == db[key]
assert "jax" not in sys.modules
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_response_decode_native_numpy_parity(rng):
    """Native decrypt_decode_row must agree with the numpy decode sequence
    (the fallback when the C engine is absent) on real protocol traffic."""
    from chalametpir_tpu.core import codec, hashing, matrix_io
    from chalametpir_tpu.native import engine as native
    from chalametpir_tpu.params import query_indicator

    db = generate_random_kv_database(300, rng=rng, value_byte_len=(1, 200))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    b = client._filter.mat_elem_bit_len

    for key in list(db)[:5]:
        while True:
            try:
                q = client.query(key)
                break
            except ArithmeticOverflowAddingQueryIndicator:
                continue
        resp = matrix_io.matrix_from_bytes(server.respond(q))
        vec_c = client._pending[key].vec_c
        digest = hashing.hash_of_key(key)
        fused = int(hashing.mix256(digest, client._filter.seed))

        kv_native = native.decrypt_decode_row(resp[0], vec_c, b, fused)

        rounding_factor = np.uint32(query_indicator(b))
        rounding_floor = np.uint32(int(rounding_factor) // 2)
        mask = np.uint32((1 << b) - 1)
        unscaled = resp[0] - vec_c
        scaled = unscaled // rounding_factor
        rem = unscaled % rounding_factor
        rounded = scaled + (rem > rounding_floor).astype(np.uint32)
        mask_row = hashing.row_mask(fused, resp.shape[1], b)
        plaintext = ((rounded & mask) + mask_row) & mask
        kv_numpy = codec.decode_kv_from_row(plaintext, b)

        assert kv_native == kv_numpy
        assert kv_native[32:] == db[key]
        assert client.process_response(key, matrix_io.matrix_to_bytes(resp)) == db[key]


def test_malformed_wire_inputs_raise_protocol_errors(rng):
    """Adversarial bytes on every wire surface must raise a
    ChalametPIRError (or ValueError at the seed guard) — never crash,
    hang, or return data. Mirrors the reference's deserializer guards
    (matrix.rs:978-999, binary_fuse_filter.rs:488-513)."""
    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import ChalametPIRError
    from chalametpir_tpu.utils import generate_random_kv_database

    db = generate_random_kv_database(300, rng=rng, value_byte_len=(4, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, arity=3, rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    key = next(iter(db))
    while True:
        try:
            query = client.query(key)
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    response = server.respond(query)

    def corruptions(blob: bytes):
        yield b""
        yield blob[: len(blob) // 2]          # truncated
        yield blob + b"\x00" * 8              # trailing garbage
        big = bytearray(blob)
        big[0:8] = (0xFFFFFFFF).to_bytes(4, "little") * 2  # huge dims
        yield bytes(big)
        flip = bytearray(blob)
        flip[rng.integers(0, len(blob))] ^= 0xFF
        yield bytes(flip)

    # server: structurally malformed queries MUST raise (a bit-flipped
    # query still parses — the server legitimately answers it)
    import pytest as _pytest

    for bad in list(corruptions(query))[:4]:
        with _pytest.raises(ChalametPIRError):
            server.respond(bad)

    # client: malformed responses. Structurally invalid bytes must leave
    # the pending query intact (reference early-return, client.rs:210-217);
    # a parseable-but-corrupt response consumes it on decode failure
    # (client.rs:267) — restore via the bench hooks around each attempt.
    pending = client.discard_query(key)
    for bad in corruptions(response):
        if bad == response:
            continue
        client.insert_query(key, pending)
        try:
            client.process_response(key, bad)
        except ChalametPIRError:
            pass
        client.discard_query(key)
    # the untouched pending state still decrypts the genuine response
    client.insert_query(key, pending)
    assert client.process_response(key, response) == db[key]

    # client setup: malformed hint / filter params / seed
    # structural corruptions only: a bit-flip inside the hint body is
    # valid wire data (wrong hints fail later at decryption, not parse)
    for bad_hint in list(corruptions(hint))[:4]:
        with _pytest.raises((ChalametPIRError, ValueError)):
            Client.setup(seed, bad_hint, fparams, device=False)
    for bad_fp in (b"", fparams[:30], fparams + b"\x00" * 4):
        with _pytest.raises((ChalametPIRError, ValueError)):
            Client.setup(seed, hint, bad_fp, device=False)
    with _pytest.raises((ChalametPIRError, ValueError)):
        Client.setup(b"short", hint, fparams, device=False)


def test_client_setup_bounds_hostile_a_expansion(rng):
    """A geometry-CONSISTENT filter blob claiming a multi-billion-entry
    DB would drive stream-mode Client.setup into a multi-TB matrix-A
    allocation (OOM killer, not a Python exception). The typed cap must
    fire first; ctr mode expands A on-device in O(chunk) and is exempt."""
    import pytest as _pytest

    from chalametpir_tpu.core import matrix_io
    from chalametpir_tpu.core.filter import BinaryFuseFilter, filter_geometry
    from chalametpir_tpu.errors import KVDatabaseSizeTooLarge
    from chalametpir_tpu.models.client import Client
    from chalametpir_tpu.params import LWE_DIMENSION

    filt_size = 1 << 31
    seg_len, seg_cnt_len, num_fp = filter_geometry(3, filt_size)
    blob = BinaryFuseFilter(
        seed=rng.bytes(32), arity=3, segment_length=seg_len,
        segment_count_length=seg_cnt_len, num_fingerprints=num_fp,
        filter_size=filt_size, mat_elem_bit_len=8,
    ).to_bytes()
    hint = matrix_io.matrix_to_bytes(np.zeros((LWE_DIMENSION, 8), np.uint32))
    with _pytest.raises(KVDatabaseSizeTooLarge, match="PIR_CLIENT_MAX_A_BYTES"):
        Client.setup(rng.bytes(32), hint, blob, device=False)


def test_setup_rejects_unencodable_inputs(rng):
    """Input-validation contracts: 0-byte values would be permanently
    unretrievable (the row codec needs the 0x81 marker strictly after the
    32-byte digest, serialization.rs:164-183), and a typo'd layout must
    not silently fall through to the digit2 planes."""
    import pytest as _pytest

    from chalametpir_tpu import Server

    seed = rng.bytes(32)
    db = {b"a-key": b"value", b"empty": b""}
    with _pytest.raises(ValueError, match="0-byte"):
        Server.setup(seed, db, rng=rng)
    with _pytest.raises(ValueError, match="layout"):
        Server.setup(seed, {b"k": b"v"}, layout="Packed", rng=rng)


def test_malformed_response_error_type_matches_native(rng):
    """The numpy fallback must raise the same InvalidResponseVector the
    native path raises for an undecodable frame — callers implementing
    the pending-survives-retry contract catch that one type."""
    import pytest as _pytest

    import chalametpir_tpu.models.client as client_mod
    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import InvalidResponseVector
    from chalametpir_tpu.utils import generate_random_kv_database

    db = generate_random_kv_database(120, rng=rng, value_byte_len=(4, 32))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    key = next(iter(db))
    while True:
        try:
            query = client.query(key)
            break
        except ArithmeticOverflowAddingQueryIndicator:
            continue
    garbage = b"\x01\x02"
    for native in (client_mod._native, None):
        orig, client_mod._native = client_mod._native, native
        try:
            with _pytest.raises(InvalidResponseVector):
                client.process_response(key, garbage)
        finally:
            client_mod._native = orig
    # pending survived both attempts: the genuine response still decodes
    assert client.process_response(key, server.respond(query)) == db[key]


def test_value_bytes_are_unauthenticated_like_reference(rng):
    """Contract pin: process_response authenticates ONLY the 32-byte
    hashed-key prefix (reference: client.rs:244-259 + serialization.rs:
    132-184) — value bytes carry no MAC. A response whose corruption
    lands entirely inside value elements therefore decodes WITHOUT error
    to a different value (PIR gives no integrity against a byzantine
    server; both implementations share this semantics). Pinned so a
    future "fix" that authenticates values doesn't silently break
    reference parity; digest-region corruption must still be rejected."""
    from chalametpir_tpu.params import query_indicator

    db = generate_random_kv_database(120, rng=rng, value_byte_len=(32, 32))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(seed, db, backend="numpy", rng=rng)
    client = Client.setup(seed, hint, fparams, device=False)
    b = server.mat_elem_bit_len
    delta = query_indicator(b)
    key = next(iter(db))

    def respond_with_bump(element_index):
        # +delta on one response element shifts exactly that decoded
        # b-bit digit by +1 (rounding is exact: the added noise is a
        # whole indicator step), leaving every other digit untouched
        resp = np.frombuffer(server.respond(_query_with_retry(client, key)),
                             np.uint8)[8:].view("<u4").copy()
        resp[element_index] += np.uint32(delta)
        hdr = np.array([1, resp.shape[0]], "<u4").tobytes()
        return hdr + resp.tobytes()

    # a value-region element: fully inside bits [256, 256 + 8*32)
    e_val = -(-256 // b)
    assert (e_val + 1) * b <= 256 + 8 * 32
    wrong = client.process_response(key, respond_with_bump(e_val))
    assert len(wrong) == 32 and wrong != db[key]

    # the same bump inside the digest region MUST be rejected
    with pytest.raises(DecodedRowNotPrependedWithDigestOfKey):
        client.process_response(key, respond_with_bump(0))
