"""Benchmark harness: reproduces the reference's divan config on TPU.

Emits JSON lines to stdout. Every line is a complete, valid record for
the headline metric (server_respond DB-scan bandwidth at 2^20 x 32 B
keys x 1 kB values, arity 3 — reference README.md:60-62, baseline
102.51 GB/s on m8g.8xlarge); later lines are supersets of earlier ones
(client metrics, then the 2^16/2^18 x arity {3,4} divan matrix). A
timeout therefore can only truncate detail, never zero the artifact.

Timing notes for this environment: the device queue acks before
completion and d2h readbacks carry a large constant dispatch latency, so
per-call wall timing lies in both directions. Respond is measured as the
slope of k chained scans inside one jit (each iteration's query depends
on the previous response, so XLA can neither hoist nor parallelise the
scans) — constant overheads cancel exactly. The host<->device tunnel
here moves ~0.03 GB/s (a tunnel artifact, not TPU DMA), which bounds
setup's DB upload and the e2e serialized path.

Env knobs:
  PIR_BENCH_LOG_N      log2 of headline DB entries (default 20)
  PIR_BENCH_ARITY      3 or 4 (default 3)
  PIR_BENCH_VALUE_LEN  value bytes (default 1024)
  PIR_BENCH_BATCH      batched-respond size (default 64)
  PIR_BENCH_BUDGET_S   wall budget; matrix configs are skipped when the
                       remaining budget cannot fit them (default 520)
  PIR_BENCH_MATRIX     "0" disables the small-config matrix
  PIR_BENCH_PRG        "ctr" (default, TPU-native) or "stream" (interop)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

LOG_N = int(os.environ.get("PIR_BENCH_LOG_N", "20"))
ARITY = int(os.environ.get("PIR_BENCH_ARITY", "3"))
VALUE_LEN = int(os.environ.get("PIR_BENCH_VALUE_LEN", "1024"))
BATCH = int(os.environ.get("PIR_BENCH_BATCH", "64"))
BUDGET_S = float(os.environ.get("PIR_BENCH_BUDGET_S", "520"))
RUN_MATRIX = os.environ.get("PIR_BENCH_MATRIX", "1") not in ("0", "")
PRG_MODE = os.environ.get("PIR_BENCH_PRG", "ctr")

BASELINE_RESPOND_GBPS = 102.51  # m8g.8xlarge, README.md:60-61
T_START = time.perf_counter()
H2D_RATE: float | None = None  # measured once in main()


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter()-T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)


def left() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


_db_cache: dict = {}


def build_db(n: int, value_len: int, rng: np.random.Generator) -> dict[bytes, bytes]:
    """Random KV DB; the most recent (n, value_len) build is cached so the
    arity-3 and arity-4 rows of one size share it (a 2^20 dict takes ~40 s
    of pure Python to construct — rebuilding it was most of the budget
    that used to squeeze the 2^20 arity-4 row out of the artifact)."""
    key = (n, value_len)
    if key in _db_cache:
        return _db_cache[key]
    from chalametpir_tpu.native.engine import alloc_array

    # values must be genuinely random: the host<->device tunnel transport
    # compresses, so low-entropy filler would flatter every upload-bound
    # number. Generate into a MAP_POPULATE buffer in chunks (a GB-scale
    # rng.bytes() spends ~10 s just demand-paging its output on this VM)
    # and materialize bytes objects via numpy 'S' views, not a Python loop.
    vals_buf = alloc_array((n * value_len,), np.uint8)
    step = 64 << 20
    for i in range(0, vals_buf.size, step):
        chunk = min(step, vals_buf.size - i)
        vals_buf[i : i + chunk] = np.frombuffer(rng.bytes(chunk), np.uint8)
    keys_buf = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    # V (void) dtype, not S: numpy S-dtype strips trailing NUL bytes on
    # tolist(), silently shortening ~1/256 of the keys/values
    keys = keys_buf.view("V32").ravel().tolist()
    vals = vals_buf.view(f"V{value_len}").tolist()
    db = dict(zip(keys, vals))
    while len(db) < n:  # vanishingly unlikely 32-byte key collisions
        k = rng.integers(0, 256, size=32, dtype=np.uint8).tobytes()
        db[k] = vals[0]
    _db_cache.clear()  # keep at most one DB alive
    _db_cache[key] = db
    return db


def make_respond_chain(server):
    """Returns scan_seconds(queries, nq): the per-scan latency measured as
    the slope of k chained DB scans inside one jit.

    The chained program is kept as small as possible — the query *digits*
    are prepared once outside the loop and the loop body is just the scan
    kernel plus a one-element XOR dependency — because compiles in this
    environment go through a remote service and program size is wall
    time (and a failure risk)."""
    import jax
    import jax.numpy as jnp

    if server._layout == "packed":
        from chalametpir_tpu.ops.packed import hi_pack_factor
        from chalametpir_tpu.ops.respond_pallas import (
            _prepare_query_digits,
            _run_lo_only,
            _run_with_hi,
        )

        db = server._planes
        m_pad = db.lo.shape[0]
        interp = jax.default_backend() == "cpu"

        # planes are call-time jit arguments: captured arrays would bake the
        # database into the program hash (fresh remote compile per DB)
        if db.hi is None:

            @jax.jit
            def chain_lo(qd, k, lo):
                def body(i, qd):
                    out = _run_lo_only(qd, lo, db.tile_k, interp)
                    return qd ^ (jnp.max(out) & 1).astype(jnp.int8)

                return jnp.max(jax.lax.fori_loop(0, k, body, qd))

            def chain(qd, k):
                return chain_lo(qd, k, db.lo)
        else:
            pack = hi_pack_factor(db.mat_elem_bit_len)
            bits = 8 // pack if pack > 1 else 8

            @jax.jit
            def chain_hi(qd, k, lo, hi):
                def body(i, qd):
                    out = _run_with_hi(qd, lo, hi, db.tile_k, pack, bits, interp)[0]
                    return qd ^ (jnp.max(out) & 1).astype(jnp.int8)

                return jnp.max(jax.lax.fori_loop(0, k, body, qd))

            def chain(qd, k):
                return chain_hi(qd, k, db.lo, db.hi)

        def prepare(queries, nq):
            q_host = np.resize(queries, (nq, queries.shape[1]))
            qd, _ = _prepare_query_digits(jax.device_put(q_host), nq, m_pad)
            return qd
    else:
        from chalametpir_tpu.ops import respond as respond_ops

        d0, d1 = server._planes

        @jax.jit
        def chain_digit2(q, k, p0, p1):
            def body(i, q):
                out = respond_ops.respond_batch(q, p0, p1)
                return q ^ jnp.max(out)

            return jnp.max(jax.lax.fori_loop(0, k, body, q))

        def chain(q, k):
            return chain_digit2(q, k, d0, d1)

        def prepare(queries, nq):
            return jax.device_put(np.resize(queries, (nq, queries.shape[1])))

    def _slope(q_dev, k_lo, k_hi, reps=3):
        out = {}
        for k in (k_lo, k_hi):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(np.asarray(chain(q_dev, k)))
                best = min(best, time.perf_counter() - t0)
            out[k] = best
        return (out[k_hi] - out[k_lo]) / (k_hi - k_lo)

    def scan_seconds(queries, nq, k_lo=4, k_hi=24):
        q_dev = prepare(queries, nq)
        float(np.asarray(chain(q_dev, 1)))  # compile+warm
        slope = _slope(q_dev, k_lo, k_hi)
        # small DBs scan in tens of us — grow k until the measured delta
        # clears timer/dispatch noise (>= ~30 ms between the two points)
        while slope * (k_hi - k_lo) < 0.03 and k_hi < 4096:
            k_lo, k_hi = k_lo * 8, k_hi * 8
            slope = _slope(q_dev, k_lo, k_hi)
        return max(slope, 1e-9)

    return scan_seconds


def run_config(log_n, arity, value_len, rng, batch=None, emit=None):
    """Run one divan config; returns a metrics dict. `emit(partial)` is
    called as soon as the respond scan number exists. The GC freeze taken
    while the config's DB dict is hot is undone afterwards so finished
    configs stay collectable."""
    import gc

    try:
        return _run_config(log_n, arity, value_len, rng, batch=batch, emit=emit)
    finally:
        gc.unfreeze()
        gc.collect()


def _run_config(log_n, arity, value_len, rng, batch=None, emit=None):
    import jax  # noqa: F401

    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.core import matrix_io
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator

    n = 1 << log_n
    rec = {"config": f"2^{log_n}x{value_len}B arity{arity} prg={PRG_MODE}"}

    t0 = time.perf_counter()
    db = build_db(n, value_len, rng)
    log(f"2^{log_n} a{arity}: db built in {time.perf_counter()-t0:.1f}s")
    # the 2^20 dict pins >2M objects in the old generation; JAX
    # tracing/compilation allocates heavily, and every gen-2 collection
    # then scans millions of objects — freeze() exempts them (measured:
    # this was most of a 20+ minute "compile"). The caller unfreezes when
    # the config is done so dead configs stay collectable.
    import gc

    gc.freeze()

    seed = rng.bytes(32)
    t0 = time.perf_counter()
    server, hint_bytes, filter_param_bytes = Server.setup(
        seed, db, arity=arity, prg_mode=PRG_MODE, rng=rng
    )
    rec["server_setup_s"] = round(time.perf_counter() - t0, 2)
    rec["b"] = server.mat_elem_bit_len
    log(f"2^{log_n} a{arity}: server_setup {rec['server_setup_s']}s (b={server.mat_elem_bit_len})")

    # attribution: setup is floored by shipping the packed DB through the
    # host<->device link (~0.03 GB/s tunnel here; ~13 GB/s on real PCIe,
    # where the same upload is <0.1 s)
    if server._backend == "jax" and server._layout == "packed" and H2D_RATE:
        planes = server._planes
        upload_bytes = planes.lo.shape[0] * server.num_response_cols + (
            planes.hi.size if planes.hi is not None else 0
        )
        rec["server_setup_upload_GB"] = round(upload_bytes / 1e9, 3)
        rec["server_setup_tunnel_floor_s"] = round(upload_bytes / 1e9 / H2D_RATE, 1)

    # --- respond scan (the headline): measured before any client work so a
    # timeout can never eat it. Uses synthetic uniform queries — the scan
    # is input-independent integer work, asserted exact vs oracle in tests.
    q_rng = np.random.default_rng(0xD15C)
    queries = q_rng.integers(0, 1 << 32, size=(1, server.num_query_cols), dtype=np.uint32)
    if server._backend == "jax":
        scan_seconds = make_respond_chain(server)
        t_respond = scan_seconds(queries, 1)
        batch = batch or BATCH
        t_respond_batch_per_q = scan_seconds(queries, batch) / batch
    else:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            server.respond_batch(queries[:1])
            times.append(time.perf_counter() - t0)
        t_respond = float(np.median(times))
        t_respond_batch_per_q = t_respond
        batch = batch or 1

    cf = matrix_io.compression_factor(server.mat_elem_bit_len)
    ref_db_bytes = server.num_query_cols * (-(-server.num_response_cols // cf)) * 4
    scan_gbps = ref_db_bytes / t_respond / 1e9
    rec.update(
        server_respond_ms=round(t_respond * 1e3, 3),
        server_respond_batch_per_query_ms=round(t_respond_batch_per_q * 1e3, 4),
        respond_scan_GBps=round(scan_gbps, 2),
        respond_batch_scan_GBps=round(ref_db_bytes / t_respond_batch_per_q / 1e9, 2),
    )
    log(
        f"2^{log_n} a{arity}: respond {t_respond*1e3:.3f} ms single "
        f"({scan_gbps:.1f} GB/s), {t_respond_batch_per_q*1e3:.4f} ms/q batched x{batch}"
    )
    if emit is not None:
        emit(rec)

    # --- client phases (kept non-fatal: the respond numbers above are
    # already emitted; a client-side device failure must not zero them)
    try:
        _client_phases(rec, log_n, arity, db, server, seed, hint_bytes,
                       filter_param_bytes)
    except Exception as e:
        log(f"2^{log_n} a{arity}: client phases failed: {e!r}")
        rec["client_error"] = repr(e)
    return rec


def _client_phases(rec, log_n, arity, db, server, seed, hint_bytes,
                   filter_param_bytes):
    from chalametpir_tpu import Client
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator

    # --- client phases. Methodology mirrors divan's medians
    # (integrations/benches/offline_phase.rs:59): one discarded warm call,
    # then the median of N.
    t0 = time.perf_counter()
    client = Client.setup(seed, hint_bytes, filter_param_bytes, prg_mode=PRG_MODE)
    rec["client_setup_s"] = round(time.perf_counter() - t0, 2)
    rec["client_on_device"] = client.uses_device
    log(f"2^{log_n} a{arity}: client_setup {rec['client_setup_s']}s (device={client.uses_device})")

    # FrodoPIR offline preprocessing (ia.cr/2022/981): the (b, c) pair is
    # key-independent, so the paper's client computes it before the query
    # key is known; the reference evaluates it lazily inside query()
    # (client.rs:106-107). Both split costs are reported: the amortized
    # offline cost per query, and the online (pooled) query latency.
    pool = 16
    t0 = time.perf_counter()
    client.prepare_queries(pool)
    prep_s = time.perf_counter() - t0
    rec["client_prepare_per_query_ms"] = round(prep_s / pool * 1e3, 2)
    rec["client_pool"] = pool
    log(f"2^{log_n} a{arity}: prepare_queries({pool}) {prep_s:.2f}s")

    def _query_retry(fn, key):
        while True:
            try:
                return fn(key)
            except ArithmeticOverflowAddingQueryIndicator:
                continue

    keys = list(db.keys())[:16]
    # online (pooled) query: warm 1, median of 8
    _query_retry(client.query, keys[0])
    times, queries_bytes = [], []
    for key in keys[1:9]:
        t0 = time.perf_counter()
        queries_bytes.append(_query_retry(client.query, key))
        times.append(time.perf_counter() - t0)
    rec["client_query_ms"] = round(float(np.median(times)) * 1e3, 3)
    # inline query (the reference's lazy order): warm 1, median of 5
    _query_retry(client.query_inline, keys[9])
    times = []
    for key in keys[10:15]:
        t0 = time.perf_counter()
        _query_retry(client.query_inline, key)
        times.append(time.perf_counter() - t0)
    rec["client_query_inline_ms"] = round(float(np.median(times)) * 1e3, 2)
    log(
        f"2^{log_n} a{arity}: client_query {rec['client_query_ms']} ms online "
        f"(pool), {rec['client_query_inline_ms']} ms inline, "
        f"prepare {rec['client_prepare_per_query_ms']} ms/q amortized"
    )

    # end-to-end serialized respond (includes tunnel transfers both ways):
    # warm 1, median of 5
    response_bytes = server.respond(queries_bytes[0])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        response_bytes = server.respond(queries_bytes[0])
        times.append(time.perf_counter() - t0)
    rec["server_respond_e2e_ms"] = round(float(np.median(times)) * 1e3, 2)

    # process_response: warm 1, median of 32 (pending state restored via
    # the reference's own bench hooks, client.rs:60-71)
    key0 = keys[1]
    value = client.process_response(key0, response_bytes)
    assert value == db[key0], "retrieval mismatch!"
    pending = client.discard_query(keys[2])
    resp2 = server.respond(queries_bytes[1])
    times = []
    for _ in range(32):
        client.insert_query(keys[2], pending)
        t0 = time.perf_counter()
        value = client.process_response(keys[2], resp2)
        times.append(time.perf_counter() - t0)
    assert value == db[keys[2]], "retrieval mismatch (hooked)!"
    rec["client_process_response_us"] = round(float(np.median(times)) * 1e6, 2)
    log(
        f"2^{log_n} a{arity}: e2e {rec['server_respond_e2e_ms']} ms, "
        f"process_response {rec['client_process_response_us']} us (median-32)"
    )


def main() -> None:
    from chalametpir_tpu.utils import compile_cache, telemetry

    telemetry.set_trace(True)  # phase spans on stderr
    compile_cache.enable_compile_cache()
    import jax

    rng = np.random.default_rng(0xBEEF)

    # first line out BEFORE any device call — and jax.default_backend()
    # below IS one (it initializes the XLA backend): device acquisition
    # through the tunnel has been observed to stall ~10 min when a prior
    # process just released it; if a harness timeout then kills this run,
    # the artifact still carries one parseable record
    print(
        json.dumps(
            {
                "metric": "server_respond_db_scan_GBps",
                "value": None,
                "unit": "GB/s",
                "vs_baseline": None,
                "status": "starting (device init pending); later lines supersede",
            }
        ),
        flush=True,
    )
    log(f"backend={jax.default_backend()} headline=2^{LOG_N} arity{ARITY} {VALUE_LEN}B budget={BUDGET_S}s")

    # measure the host->device link once: server_setup here is dominated by
    # shipping the packed DB through this environment's tunnel (~0.03 GB/s;
    # real TPU DMA would make the same upload ~0.1 s), so the artifact
    # carries the rate for attribution
    import jax.numpy as jnp

    h2d_rate = None
    try:
        warm = jax.device_put(np.zeros(1 << 20, np.int8))
        float(jnp.max(warm.astype(jnp.int32)))  # device init + queue drain
        del warm
        # random payload: the tunnel transport compresses, so a zeros
        # probe reads ~2x the rate the (incompressible) packed DB planes
        # actually get
        probe = np.random.default_rng(7).integers(
            -128, 128, size=32 << 20
        ).astype(np.int8)
        t0 = time.perf_counter()
        d = jax.device_put(probe)
        float(jnp.max(d.astype(jnp.int32)))  # force the transfer to drain
        h2d_rate = round(probe.nbytes / (time.perf_counter() - t0) / 1e9, 4)
        del d
    except Exception:
        pass
    log(f"tunnel h2d ~{h2d_rate} GB/s")
    global H2D_RATE
    H2D_RATE = h2d_rate

    result = {
        "metric": "server_respond_db_scan_GBps",
        "value": None,
        "unit": "GB/s",
        "vs_baseline": None,
        "tunnel_h2d_GBps": h2d_rate,
    }

    def emit(rec):
        result["value"] = rec.get("respond_scan_GBps")
        result["vs_baseline"] = (
            round(rec["respond_scan_GBps"] / BASELINE_RESPOND_GBPS, 3)
            if rec.get("respond_scan_GBps")
            else None
        )
        merged = {**result, **{k: v for k, v in rec.items() if k not in result}}
        result.update(merged)
        print(json.dumps(merged), flush=True)

    headline = run_config(LOG_N, ARITY, VALUE_LEN, rng, emit=emit)
    emit(headline)

    if RUN_MATRIX:
        matrix = []
        # divan config sweep (integrations/benches/offline_phase.rs:40-57),
        # completed with the 2^20 arity-4 headline row — run FIRST so it
        # reuses the headline's still-cached 2^20 DB dict
        for log_n, arity in ((20, 4), (16, 3), (16, 4), (18, 3), (18, 4)):
            # per-config floors (warm, DB dict cached for the 2^20 row)
            need = {16: 25, 18: 45, 20: 100}[log_n]
            if left() < need:
                log(f"matrix: skipping 2^{log_n} a{arity} (budget)")
                matrix.append({"config": f"2^{log_n} arity{arity}", "skipped": "budget"})
                continue
            try:
                matrix.append(run_config(log_n, arity, VALUE_LEN, rng, batch=16))
            except Exception as e:  # keep the artifact even if a config dies
                log(f"matrix: 2^{log_n} a{arity} failed: {e!r}")
                matrix.append({"config": f"2^{log_n} arity{arity}", "error": repr(e)})
            result["matrix"] = matrix
            print(json.dumps(result), flush=True)

    # scaling anchor above 2^20 (single chip): respond scan + setup only,
    # attempted when the remaining budget allows (PIR_BENCH_SCALING_LOG_N
    # to force a size; 0 disables; off for scaled-down smoke runs)
    scale_default = "21" if LOG_N >= 20 else "0"
    scale_log_n = int(os.environ.get("PIR_BENCH_SCALING_LOG_N", scale_default))
    # the scaling setup is tunnel-bound: gate on the measured rate so the
    # attempt only starts when it can actually finish inside the budget
    # (packed 2^21 planes ~2.5 GB; +60 s for DB build/encode/scan/slack)
    scale_need = 60 + (2.5 * (1 << scale_log_n) / (1 << 21)) / (H2D_RATE or 0.03)
    if scale_log_n and left() > scale_need:
        try:
            rec = _run_scaling_point(scale_log_n, rng)
            result["scaling"] = rec
            print(json.dumps(result), flush=True)
        except Exception as e:
            log(f"scaling 2^{scale_log_n} failed: {e!r}")
            result["scaling"] = {"config": f"2^{scale_log_n}", "error": repr(e)}
            print(json.dumps(result), flush=True)
    elif scale_log_n:
        log(f"scaling 2^{scale_log_n}: skipped (need ~{scale_need:.0f}s, left {left():.0f}s)")
        result["scaling"] = {"config": f"2^{scale_log_n}", "skipped": "budget"}
        print(json.dumps(result), flush=True)


def _run_scaling_point(log_n, rng):
    """Respond-scan + setup at a >2^20 size (the 2^23 sharded target's
    kernel regime on one chip): value 1 kB, arity 3."""
    import gc

    from chalametpir_tpu import Server
    from chalametpir_tpu.core import matrix_io

    n = 1 << log_n
    rec = {"config": f"2^{log_n}x1024B arity3 prg={PRG_MODE}"}
    db = build_db(n, 1024, rng)
    gc.freeze()
    try:
        seed = rng.bytes(32)
        t0 = time.perf_counter()
        server, hint_bytes, fpb = Server.setup(
            seed, db, arity=3, prg_mode=PRG_MODE, rng=rng
        )
        rec["server_setup_s"] = round(time.perf_counter() - t0, 2)
        rec["b"] = server.mat_elem_bit_len
        q_rng = np.random.default_rng(0xD15C)
        queries = q_rng.integers(
            0, 1 << 32, size=(1, server.num_query_cols), dtype=np.uint32
        )
        scan_seconds = make_respond_chain(server)
        t_respond = scan_seconds(queries, 1)
        cf = matrix_io.compression_factor(server.mat_elem_bit_len)
        ref_db_bytes = server.num_query_cols * (-(-server.num_response_cols // cf)) * 4
        rec["server_respond_ms"] = round(t_respond * 1e3, 3)
        rec["respond_scan_GBps"] = round(ref_db_bytes / t_respond / 1e9, 2)
        log(
            f"scaling 2^{log_n}: setup {rec['server_setup_s']}s, "
            f"scan {rec['respond_scan_GBps']} GB/s"
        )
        return rec
    finally:
        gc.unfreeze()
        gc.collect()


if __name__ == "__main__":
    main()
