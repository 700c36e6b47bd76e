"""Diagnose the 2^23-regime scan-rate drop (684-697 GB/s actual HBM vs
743 at the 2^20 geometry): sweep tile_k and the c_pad lane count over
SYNTHETIC device-generated planes at the exact 2^23 b=8 lo-only geometry
(m = 9,437,184, cols = 1057 -> c_pad 1152). The kernel is
input-independent integer work, so the rates are the real ones.

Two hypotheses this separates:
  - grid overhead / DMA sizing  -> rate moves with tile_k
  - the 9x128-lane c_pad tax    -> rate at c_pad=1024 matches 2^20's 91%
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from chalametpir_tpu.core import codec
    from chalametpir_tpu.core.filter import filter_geometry
    from chalametpir_tpu.models.server import Server
    from chalametpir_tpu.ops import respond_pallas
    from chalametpir_tpu.params import find_mat_elem_bit_len
    from bench import make_respond_chain

    log_n, value_len = 23, 1024
    n = 1 << log_n
    b = find_mat_elem_bit_len(n)
    _, _, m = filter_geometry(3, n)
    cols = codec.encoded_row_width(value_len, b)
    assert b == 8, b
    c_pad_full = -(-cols // respond_pallas.LANE) * respond_pallas.LANE
    print(f"m={m} cols={cols} c_pad={c_pad_full} b={b}", flush=True)
    # m must divide by every swept tile so one plane serves all of them
    tiles = [1024, 2048, 4096]
    for t in tiles:
        assert m % t == 0, (m, t)

    chunk = 1 << 19

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(
            buf, jax.lax.bitcast_convert_type(bits, jnp.int8),
            (r0, jnp.int32(0)))

    def gen_plane(c_pad):
        t0 = time.perf_counter()
        lo = jnp.full((m, c_pad), -128, jnp.int8)
        key = jax.random.PRNGKey(0x23)
        for r0 in range(0, m, chunk):
            key, sub = jax.random.split(key)
            lo = fill(lo, sub, jnp.int32(r0), min(chunk, m - r0))
        lo.block_until_ready()
        print(f"plane c_pad={c_pad}: {lo.nbytes/1e9:.2f} GB "
              f"in {time.perf_counter()-t0:.1f}s", flush=True)
        return lo

    q_rng = np.random.default_rng(0xD15C)
    queries = q_rng.integers(0, 1 << 32, size=(1, m), dtype=np.uint32)

    def sweep(lo, c_eff):
        for tile_k in tiles:
            pdb = respond_pallas.PallasDB(lo, None, b, m, c_eff, tile_k)
            server = Server("jax", pdb, m, c_eff, b, "packed")
            scan_s = make_respond_chain(server)(queries, 1)
            hbm = lo.nbytes + 4 * m  # lo plane + the int8 qd row block
            print(f"  tile_k={tile_k}: {scan_s*1e3:.3f} ms/scan  "
                  f"actual-HBM {lo.nbytes/scan_s/1e9:.1f} GB/s  "
                  f"(+qd {hbm/scan_s/1e9:.1f})", flush=True)

    lo = gen_plane(c_pad_full)
    print(f"c_pad={c_pad_full} (9x128 lanes, the real geometry):", flush=True)
    sweep(lo, cols)
    lo.delete()

    lo = gen_plane(1024)
    print("c_pad=1024 (8x128 lanes, counterfactual):", flush=True)
    sweep(lo, 1017)  # logical cols that would pad to 1024
    lo.delete()


if __name__ == "__main__":
    main()
