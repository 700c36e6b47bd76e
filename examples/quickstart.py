"""Runnable quickstart: the full PIR protocol on a small database.

    python examples/quickstart.py [--entries 2000] [--prg-mode ctr]

Uses whatever backend jax finds (TPU if present, else CPU); pass
--cpu to force the CPU backend. Mirrors the README snippet with timing
prints; the reference's equivalent flow is test_pir.rs:13-86.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=2000)
    ap.add_argument("--prg-mode", default="ctr", choices=("ctr", "stream"),
                    help="ctr = TPU-native; stream = reference-interop")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--pool", type=int, default=4,
                    help="FrodoPIR offline query preprocessing depth")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from chalametpir_tpu import Client, Server
    from chalametpir_tpu.errors import ArithmeticOverflowAddingQueryIndicator
    from chalametpir_tpu.utils import generate_random_kv_database

    rng = np.random.default_rng()
    db = generate_random_kv_database(args.entries, rng=rng)
    seed = rng.bytes(32)

    t0 = time.perf_counter()
    server, hint, filter_params = Server.setup(
        seed, db, arity=3, prg_mode=args.prg_mode, rng=rng
    )
    print(f"server setup: {time.perf_counter()-t0:.2f}s "
          f"({args.entries} entries, b={server.mat_elem_bit_len})")

    t0 = time.perf_counter()
    client = Client.setup(seed, hint, filter_params, prg_mode=args.prg_mode,
                          prepared_queries=args.pool)
    print(f"client setup: {time.perf_counter()-t0:.2f}s "
          f"(device={client.uses_device}, pool={args.pool})")

    for key in list(db)[:3]:
        t0 = time.perf_counter()
        while True:
            try:
                query = client.query(key)
                break
            except ArithmeticOverflowAddingQueryIndicator:
                continue  # protocol-legitimate retry, ~arity/2^b odds
        t_q = time.perf_counter() - t0
        t0 = time.perf_counter()
        response = server.respond(query)
        t_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        value = client.process_response(key, response)
        t_p = time.perf_counter() - t0
        assert value == db[key]
        print(f"key {key[:8].hex()}…: query {t_q*1e3:.2f} ms, "
              f"respond {t_r*1e3:.2f} ms, decode {t_p*1e6:.0f} us -> "
              f"{len(value)} B value OK")
    print("quickstart OK")


if __name__ == "__main__":
    main()
