"""Compiled-mode kernel assertions on real TPU hardware.

The default suite forces the CPU backend, where every Pallas kernel runs
through the interpreter; a Mosaic-compiled kernel can diverge from the
interpreter, so this tier re-runs the exactness assertions compiled.
`make check-tpu` (PIR_TEST_TPU=1 pytest -m tpu) — the analogue of the
reference CI running its suite under `--features gpu`
(test_ci.yml:36-48).

Sizes are kept small; the compile cache (utils/compile_cache.py) makes
repeat runs cheap.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("no accelerator backend present")
    from chalametpir_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def test_respond_packed_compiled_exact(rng):
    """Compiled packed respond vs the uint64 numpy oracle, both plane
    regimes (lo-only b=8, hi-packed b=10)."""
    from chalametpir_tpu.ops import respond_pallas

    for b in (8, 10):
        m, c = 4096, 96
        mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint16)
        db = respond_pallas.build_pallas_db(mat, b)
        q = rng.integers(0, 1 << 32, size=(3, m), dtype=np.uint32)
        out = np.asarray(respond_pallas.respond_batch_packed(jax.device_put(q), db, interpret=False))
        want = (q.astype(np.uint64) @ mat.astype(np.uint64)).astype(np.uint32)
        assert np.array_equal(out, want), f"compiled respond mismatch at b={b}"


def test_ctr_prg_compiled_matches_host(rng):
    """Compiled Pallas Keccak ctr generator vs the host XOF."""
    from chalametpir_tpu.core import prg
    from chalametpir_tpu.ops import prg_jax
    from chalametpir_tpu.params import LWE_DIMENSION

    seed = rng.bytes(32)
    sw = prg_jax.seed_to_words(seed)
    a = prg.expand_seed(LWE_DIMENSION, 300, seed, mode="ctr")
    slab = np.asarray(prg_jax.expand_fp_slab_device(sw, 0, 300, LWE_DIMENSION))
    assert np.array_equal(slab.T, a)
    part = np.asarray(prg_jax.expand_fp_slab_device(sw, 37, 11, LWE_DIMENSION))
    assert np.array_equal(part.T, a[:, 37:48])


def test_client_device_matvec_compiled_exact(rng):
    """Compiled device client engine (both layouts) vs host math."""
    from chalametpir_tpu.core import prg
    from chalametpir_tpu.ops.client_device import DeviceQueryEngine
    from chalametpir_tpu.params import LWE_DIMENSION

    m = 500
    seed = rng.bytes(32)
    codes = rng.integers(0, 3, size=LWE_DIMENSION).astype(np.int8)
    for prg_mode in ("ctr", "stream"):
        a = prg.expand_seed(LWE_DIMENSION, m, seed, mode=prg_mode)
        if prg_mode == "ctr":
            eng = DeviceQueryEngine.from_seed_ctr(seed, m)
        else:
            eng = DeviceQueryEngine.from_host_matrix(a)
        got = eng.matvec(codes)
        pos = a[codes == 1].sum(axis=0, dtype=np.uint64)
        neg = a[codes == 2].sum(axis=0, dtype=np.uint64)
        want = (pos - neg).astype(np.uint32)
        assert np.array_equal(got, want), f"matvec mismatch ({prg_mode})"


def test_pipelined_setup_compiled_round_trip(rng):
    """Full pipelined ctr setup + pooled client + respond on hardware,
    hint checked byte-identical against the numpy oracle."""
    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator
    from chalametpir_tpu.utils import generate_random_kv_database

    db = generate_random_kv_database(400, rng=rng, value_byte_len=(1, 64))
    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(
        seed, db, backend="jax", prg_mode="ctr", rng=np.random.default_rng(3)
    )
    _, hint_np, fp_np = Server.setup(
        seed, db, backend="numpy", prg_mode="ctr", rng=np.random.default_rng(3)
    )
    assert hint == hint_np and fparams == fp_np
    client = Client.setup(seed, hint, fparams, prg_mode="ctr", prepared_queries=2)
    for key in list(db.keys())[:2]:
        while True:
            try:
                q = client.query(key)
                break
            except ArithmeticOverflowAddingQueryIndicator:
                continue
        assert client.process_response(key, server.respond(q)) == db[key]


def test_pipelined_setup_multichunk_buffer_reuse_compiled(rng):
    """Force a multi-chunk pipeline ON HARDWARE so the round-robin
    pack-buffer reuse (reuse_bufs — accelerator-only; the CPU backend
    device_put can zero-copy alias host buffers, so the CPU-tier sibling
    in test_setup_pipeline.py necessarily runs the fresh-buffer path)
    actually cycles: chunks 3+ rewrite a host buffer a prior device_put
    read from, guarded only by block_until_ready on the arrays produced
    from it. Hint must stay byte-identical to the numpy oracle.

    Manual set/restore instead of the monkeypatch fixture: bench's
    run_check_tpu drives these functions as fn(rng) outside pytest."""
    from chalametpir_tpu import Server
    from chalametpir_tpu.models import server as server_mod
    from chalametpir_tpu.utils import generate_random_kv_database

    saved = server_mod._CTR_CHUNK_COLS
    server_mod._CTR_CHUNK_COLS = 512
    try:
        db = generate_random_kv_database(8192, rng=rng, value_byte_len=(1, 64))
        seed = rng.bytes(32)
        server_jax, hint_jax, fp_jax = Server.setup(
            seed, db, arity=3, backend="jax", prg_mode="ctr",
            rng=np.random.default_rng(11),
        )
        from chalametpir_tpu.core.filter import filter_geometry
        from chalametpir_tpu.ops import respond_pallas

        _, _, num_fp = filter_geometry(3, len(db))
        assert -(-num_fp // server_mod._ctr_chunk_cols(
            num_fp, respond_pallas.DEFAULT_TILE_K)) >= 3
        server_np, hint_np, fp_np = Server.setup(
            seed, db, arity=3, backend="numpy", prg_mode="ctr",
            rng=np.random.default_rng(11),
        )
    finally:
        server_mod._CTR_CHUNK_COLS = saved
    assert fp_jax == fp_np
    assert hint_jax == hint_np
    q = np.random.default_rng(3).integers(
        0, 1 << 32, size=(2, server_np.num_query_cols), dtype=np.uint32
    )
    assert np.array_equal(server_jax.respond_batch(q), server_np.respond_batch(q))


def test_sharded_ctr_hint_single_device_mesh(rng):
    """The shard_map ctr hint path compiled on the real backend (a 1x1
    mesh on one chip — the collective structure still runs)."""
    from chalametpir_tpu.core import prg
    from chalametpir_tpu.parallel import (
        build_sharded_pallas_db,
        make_mesh,
        sharded_hint_ctr_packed,
    )
    from chalametpir_tpu.params import LWE_DIMENSION

    if len(jax.devices()) < 1:
        pytest.skip("no devices")
    mesh = make_mesh(devices=jax.devices()[:1], data=1, model=1)
    m, c, b = 700, 40, 8
    mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint16)
    seed = rng.bytes(32)
    db = build_sharded_pallas_db(mesh, mat, b)
    hint = sharded_hint_ctr_packed(mesh, db, seed)
    a = prg.expand_seed(LWE_DIMENSION, m, seed, mode="ctr")
    want = (a.astype(np.uint64) @ mat.astype(np.uint64)).astype(np.uint32)
    assert np.array_equal(hint[:, :c], want)


def test_sharded_respond_single_device_mesh(rng):
    """The shard_map packed respond path compiled on the real backend
    (1x1 mesh — the collective structure still runs), exact vs the
    uint64 oracle."""
    from chalametpir_tpu.parallel import (
        build_sharded_pallas_db,
        make_mesh,
        sharded_respond_packed_fn,
    )

    mesh = make_mesh(devices=jax.devices()[:1], data=1, model=1)
    m, c, b = 900, 48, 9
    mat = rng.integers(0, 1 << b, size=(m, c), dtype=np.uint16)
    db = build_sharded_pallas_db(mesh, mat, b)
    respond = sharded_respond_packed_fn(mesh, db)
    m_pad = db.lo.shape[0]
    q = rng.integers(0, 1 << 32, size=(2, m), dtype=np.uint32)
    q_pad = np.pad(q, ((0, 0), (0, m_pad - m)))
    out = np.asarray(respond(q_pad))[:, :c]
    want = (q.astype(np.uint64) @ mat.astype(np.uint64)).astype(np.uint32)
    assert np.array_equal(out, want)


def test_tcp_round_trip_compiled(rng):
    """The TCP pair served by a compiled device respond path (C13 on
    real hardware — the CPU-mesh suite runs it through the Pallas
    interpreter only)."""
    import asyncio

    from chalametpir_tpu.models.server import Server
    from chalametpir_tpu.net.client import fetch
    from chalametpir_tpu.net.server import DEMO_DB, PirTcpServer

    seed = rng.bytes(32)
    server, hint, fparams = Server.setup(
        seed, DEMO_DB, backend="jax", prg_mode="ctr", rng=rng
    )
    tcp = PirTcpServer(server, seed, hint, fparams)

    async def run():
        srv = await asyncio.start_server(tcp.handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        async with srv:
            return await fetch(
                "127.0.0.1", port, [b"banana", b"kiwi"], prg_mode="ctr"
            )

    results = asyncio.run(run())
    assert results[b"banana"] == b"yellow"
    assert results[b"kiwi"] == b"brown"


def test_streaming_engine_compiled_exact(rng):
    """Compiled streaming client engine (per-batch ctr slab gen + fold)
    vs the host matvec."""
    from chalametpir_tpu.core import prg
    from chalametpir_tpu.ops.client_device import DeviceQueryEngine
    from chalametpir_tpu.params import LWE_DIMENSION

    m = 700
    seed = rng.bytes(32)
    a = prg.expand_seed(LWE_DIMENSION, m, seed, mode="ctr")
    eng = DeviceQueryEngine.streaming_from_seed_ctr(seed, m, cols_per_step=256)
    codes = rng.integers(0, 3, size=(2, LWE_DIMENSION)).astype(np.int8)
    got = eng.matvec_batch(codes)
    for i in range(2):
        pos = a[codes[i] == 1].sum(axis=0, dtype=np.uint64)
        neg = a[codes[i] == 2].sum(axis=0, dtype=np.uint64)
        assert np.array_equal(got[i], (pos - neg).astype(np.uint32))
