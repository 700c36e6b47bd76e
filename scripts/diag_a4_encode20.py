"""2^20-scale host-side repro of the a4 streaming-encode regression.

Consumer variants: instant (just iterate) and pack (build_packed_planes
per chunk, as the real pipeline does). No device anywhere.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from chalametpir_tpu.core import encode_db
from chalametpir_tpu.models.server import _ctr_chunk_cols
from chalametpir_tpu.core.filter import filter_geometry
from chalametpir_tpu.native import engine as native_eng


def build_db(n, value_len, rng):
    keys_buf = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    vals_buf = rng.integers(0, 256, size=(n, value_len), dtype=np.uint8)
    keys = keys_buf.view("V32").ravel().tolist()
    vals = vals_buf.view(f"V{value_len}").ravel().tolist()
    return dict(zip(keys, vals))


def run(log_n, arity, consumer, value_len=1024, b=9):
    n = 1 << log_n
    rng = np.random.default_rng(0xE2C0DE + arity)
    t0 = time.perf_counter()
    db = build_db(n, value_len, rng)
    print(f"2^{log_n} a{arity}: db built {time.perf_counter()-t0:.0f}s", flush=True)

    _, _, num_fp = filter_geometry(arity, n)
    cc = _ctr_chunk_cols(num_fp, 2048)
    t0 = time.perf_counter()
    mat, filt, chunks = encode_db.from_kv_database_streaming(db, arity, b, cc, 100, rng)
    t_pre = time.perf_counter() - t0
    m_pad, cols = mat.shape
    c_pad = -(-cols // 128) * 128
    waits, packs = [], []
    t_start = time.perf_counter()
    t0 = t_start
    for j in chunks:
        waits.append(round(time.perf_counter() - t0, 2))
        if consumer == "pack":
            t0 = time.perf_counter()
            lo, hi = native_eng.build_packed_planes(
                mat[j * cc : (j + 1) * cc], cc, c_pad, 8, 1, tight_lo=True
            )
            packs.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
    total = time.perf_counter() - t_start
    print(
        f"2^{log_n} a{arity} consumer={consumer}: pre={t_pre:.1f}s "
        f"loop={total:.1f}s wait_sum={sum(waits):.1f} pack_sum={sum(packs):.1f}\n"
        f"  waits: {waits}\n  packs: {packs}",
        flush=True,
    )


if __name__ == "__main__":
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    for arity in (3, 4):
        for consumer in ("instant", "pack"):
            run(log_n, arity, consumer)
