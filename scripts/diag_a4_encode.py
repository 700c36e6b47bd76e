"""Reproduce the arity-4 streaming-encode slowdown host-side (no device).

Times (a) the plain fused encode (encode_assemble_rows16), (b) the
chunk-ordered streaming encode with an instant consumer, for arity 3
vs 4 at the same size. The r4 artifact shows a4's streaming wall ~17x
the a3 worker CPU at 2^20 — this isolates where.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from chalametpir_tpu.core import encode_db
from chalametpir_tpu.models.server import _ctr_chunk_cols
from chalametpir_tpu.core.filter import filter_geometry


def build_db(n, value_len, rng):
    keys_buf = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    vals_buf = rng.integers(0, 256, size=(n, value_len), dtype=np.uint8)
    keys = keys_buf.view("V32").ravel().tolist()
    vals = vals_buf.view(f"V{value_len}").ravel().tolist()
    return dict(zip(keys, vals))


def run(log_n, arity, value_len=1024):
    n = 1 << log_n
    rng = np.random.default_rng(0xE2C0DE + arity)
    db = build_db(n, value_len, rng)
    b = 10

    t0 = time.perf_counter()
    mat_plain, filt = encode_db.from_kv_database(db, arity, b, 100, rng)
    t_plain = time.perf_counter() - t0

    _, _, num_fp = filter_geometry(arity, n)
    cc = _ctr_chunk_cols(num_fp, 2048)
    t0 = time.perf_counter()
    mat, filt2, chunks = encode_db.from_kv_database_streaming(
        db, arity, b, cc, 100, rng
    )
    t_pre = time.perf_counter() - t0
    waits = []
    t0 = time.perf_counter()
    for j in chunks:
        waits.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
    t_stream = sum(waits) + t_pre
    print(
        f"2^{log_n} a{arity}: plain={t_plain:.1f}s  stream pre={t_pre:.1f}s "
        f"chunks={len(waits)} stream_total={t_stream:.1f}s\n"
        f"  per-chunk waits: {waits}"
    )


if __name__ == "__main__":
    for arity in (3, 4):
        run(int(sys.argv[1]) if len(sys.argv) > 1 else 18, arity)
