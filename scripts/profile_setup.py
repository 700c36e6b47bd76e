"""Phase-level profile of server setup at the headline config.

Usage: python scripts/profile_setup.py [LOG_N] [ARITY]
Prints per-phase wall times to stderr; used to attribute setup cost.
"""

from __future__ import annotations

import sys
import time

import numpy as np

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
ARITY = int(sys.argv[2]) if len(sys.argv) > 2 else 3
VALUE_LEN = 1024


def tick(label, t0):
    t1 = time.perf_counter()
    print(f"[profile] {label}: {t1 - t0:.2f}s", file=sys.stderr, flush=True)
    return t1


def main():
    from chalametpir_tpu.core import codec, hashing
    from chalametpir_tpu.core.filter import construct_filter
    from chalametpir_tpu.native import engine as native
    from chalametpir_tpu.params import find_mat_elem_bit_len

    n = 1 << LOG_N
    rng = np.random.default_rng(0xBEEF)

    t0 = time.perf_counter()
    keys_buf = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    vals_buf = rng.integers(0, 256, size=n * VALUE_LEN, dtype=np.uint8).tobytes()
    keys = [keys_buf[i].tobytes() for i in range(n)]
    values = [vals_buf[i * VALUE_LEN : (i + 1) * VALUE_LEN] for i in range(n)]
    t0 = tick("build_db", t0)

    bit_len = find_mat_elem_bit_len(n)
    digests = hashing.hash_of_keys_batch(keys)
    t0 = tick(f"hash_keys (b={bit_len})", t0)

    filt, reverse_order, reverse_h, key_index = construct_filter(digests, ARITY, bit_len, 100, rng)
    t0 = tick("construct_filter", t0)

    cols = codec.encoded_row_width(VALUE_LEN, bit_len)
    digest_bytes = np.ascontiguousarray(digests).view(np.uint8).reshape(n, 32)

    mat = native.encode_assemble_rows16(
        digest_bytes, values, key_index, reverse_order, reverse_h, bit_len, cols,
        filt.num_fingerprints, filt.arity, filt.segment_length, filt.segment_count_length,
    )
    t0 = tick(f"encode_assemble_rows16 fused ({mat.nbytes/1e9:.2f} GB D)", t0)

    # device phases
    import jax

    from chalametpir_tpu.ops import respond_pallas

    m = filt.num_fingerprints
    db = respond_pallas.build_pallas_db(mat, bit_len)
    jax.block_until_ready(db.lo)
    t0 = tick("build_pallas_db (pack+upload)", t0)

    from chalametpir_tpu.ops import prg_jax

    seed = rng.bytes(32)
    seed_words = prg_jax.seed_to_words(seed)
    rows_per_step = 128

    import jax.numpy as jnp

    @jax.jit
    def gen_slab(blk0_words, offset):
        return prg_jax.rows_from_blocks(seed_words, blk0_words, offset, rows_per_step, m)

    blk0_words = jnp.asarray(np.array([0, 0], np.uint32))
    slab = gen_slab(blk0_words, jnp.int32(0))
    jax.block_until_ready(slab)
    t0 = tick("gen_slab compile+first", t0)
    for _ in range(3):
        slab = gen_slab(blk0_words, jnp.int32(0))
        jax.block_until_ready(slab)
    t0 = tick("gen_slab x3 steady", t0)

    out = respond_pallas.respond_batch_packed(slab, db)
    jax.block_until_ready(out)
    t0 = tick("respond_batch_packed compile+first", t0)
    for _ in range(3):
        out = respond_pallas.respond_batch_packed(slab, db)
        jax.block_until_ready(out)
    t0 = tick("respond_batch_packed x3 steady", t0)

    n_steps = -(-1774 // rows_per_step)
    print(f"[profile] projected hint loop: {n_steps} steps", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
