"""The bench harness is a driver-facing artifact: a syntax error or a
broken helper zeroes the official BENCH record. Smoke-test its pieces
with no device dependency."""

import json
import subprocess
import sys

import numpy as np


def test_bench_importable_and_db_builder():
    import bench

    rng = np.random.default_rng(1)
    db = bench.build_db(256, 64, rng)
    assert len(db) == 256
    assert all(len(k) == 32 and len(v) == 64 for k, v in db.items())


def test_bench_run_config_numpy_backend(monkeypatch):
    """run_config end-to-end against the numpy backend (no device): must
    return a complete record with the headline fields."""
    import bench

    import chalametpir_tpu.models.server as server_mod

    orig = server_mod.Server.setup.__func__

    def numpy_setup(cls, seed, db, **kw):
        kw["backend"] = "numpy"
        return orig(cls, seed, db, **kw)

    monkeypatch.setattr(server_mod.Server, "setup", classmethod(numpy_setup))
    rng = np.random.default_rng(2)
    rec = bench.run_config(8, 3, 64, rng, batch=2)
    for field in (
        "server_setup_s",
        "respond_scan_GBps",
        "client_setup_s",
        "client_query_ms",
        "client_process_response_us",
    ):
        assert field in rec, field
    assert rec["respond_scan_GBps"] > 0


def test_bench_emits_valid_json_lines():
    """Tiny full bench run in a subprocess on the CPU backend: every
    stdout line must be a valid JSON record carrying the headline metric."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy, sys\n"
        "sys.argv = ['bench.py']\n"
        "runpy.run_path('/root/repo/bench.py', run_name='__main__')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        env={
            **__import__("os").environ,
            "PYTHONPATH": "/root/repo",
            "PIR_BENCH_LOG_N": "8",
            "PIR_BENCH_VALUE_LEN": "64",
            "PIR_BENCH_MATRIX": "0",
            "PIR_BENCH_BATCH": "2",
        },
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines, out.stderr[-1000:]
    for line in lines:
        rec = json.loads(line)
        assert rec["metric"] == "server_respond_db_scan_GBps"
        # the driver parses a ~2 KB output tail: every line must fit it
        # with room to spare (the round-3 artifact died to this)
        assert len(line) <= 1900, f"bench line too long ({len(line)} B)"
    final = json.loads(lines[-1])
    assert final["value"] is not None
    assert final["rows"], "final record must carry the per-config rows"
