"""Reproduce the 2^18 stream client_setup anomaly host-side (VERDICT r4
weak #2): 34.1 s recorded vs ~3.3 s predicted from the XOF rate.

Builds the same 2^18 x 1kB DB dict bench uses (fragmenting the heap),
then times Client.setup(device=False, stream) with a phase breakdown:
alloc_array populate vs XOF squeeze.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from chalametpir_tpu.native import engine as native_eng


def main():
    n = 1 << 18
    value_len = 1024
    rng = np.random.default_rng(0xC11E)
    t0 = time.perf_counter()
    vals_buf = native_eng.alloc_array((n * value_len,), np.uint8)
    step = 64 << 20
    for i in range(0, vals_buf.size, step):
        chunk = min(step, vals_buf.size - i)
        vals_buf[i : i + chunk] = np.frombuffer(rng.bytes(chunk), np.uint8)
    keys_buf = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    keys = keys_buf.view("V32").ravel().tolist()
    vals = vals_buf.view(f"V{value_len}").tolist()
    db = dict(zip(keys, vals))
    print(f"db built {time.perf_counter()-t0:.1f}s ({len(db)} entries)", flush=True)

    import gc

    gc.freeze()

    # run a server setup on numpy backend to fragment further like bench?
    # skip: measure the client pieces directly.
    from chalametpir_tpu.core.filter import filter_geometry

    _, _, m = filter_geometry(3, n)
    nbytes = 1774 * m * 4
    print(f"A bytes: {nbytes/1e9:.2f} GB", flush=True)

    # phase 1: allocation (MAP_POPULATE) alone
    t0 = time.perf_counter()
    buf = native_eng.alloc_array((nbytes,), np.uint8)
    t_alloc = time.perf_counter() - t0
    print(f"alloc_array({nbytes>>20} MB): {t_alloc:.2f}s", flush=True)
    del buf

    # phase 2: the full stream squeeze (includes its own alloc)
    from chalametpir_tpu.core import prg

    t0 = time.perf_counter()
    a = prg.expand_seed(1774, m, b"\x07" * 32, mode="stream")
    t_exp = time.perf_counter() - t0
    print(f"expand_seed stream: {t_exp:.2f}s "
          f"({nbytes/1e9/t_exp:.2f} GB/s)", flush=True)
    del a

    # phase 3: repeat to see warm-heap behavior
    t0 = time.perf_counter()
    a = prg.expand_seed(1774, m, b"\x08" * 32, mode="stream")
    print(f"expand_seed stream (again): {time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
