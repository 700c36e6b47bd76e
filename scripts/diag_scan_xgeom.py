"""Cross-geometry control for the 2^23 scan-rate question.

diag_scan_tile23.py showed the 2^23-regime rate (~691 GB/s actual HBM)
is invariant to tile_k (1024/2048/4096) and to the 9x128-lane c_pad
(1152 vs 1024) — refuting grid-overhead and lane-padding. Two axes
remain: plane height m, and the kernel VARIANT (b=8 is lo-only; b=9,
used by 2^20/2^21/2^22, is the packed lo+hi kernel). This script
crosses them — 4 synthetic device-generated configs in ONE session so
co-tenant drift cannot masquerade as geometry:

    m=2^20-geom x {b=8 lo-only, b=9 lo+hi}
    m=2^23-geom x {b=8 lo-only, b=9 lo+hi}

Whichever axis the rate tracks is the cause; if neither, the historical
gap was environmental drift between sessions.
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from chalametpir_tpu.core import codec
    from chalametpir_tpu.core.filter import filter_geometry
    from chalametpir_tpu.models.server import Server
    from chalametpir_tpu.ops import respond_pallas
    from chalametpir_tpu.ops.packed import hi_bits, hi_pack_factor
    from bench import make_respond_chain

    tile_k = 1024
    chunk = 1 << 19

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill_i8(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(
            buf, jax.lax.bitcast_convert_type(bits, jnp.int8),
            (r0, jnp.int32(0)))

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill_u8(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(buf, bits, (r0, jnp.int32(0)))

    def gen(shape, dtype, fill, seed):
        buf = (jnp.full(shape, -128, jnp.int8) if dtype == jnp.int8
               else jnp.zeros(shape, jnp.uint8))
        key = jax.random.PRNGKey(seed)
        for r0 in range(0, shape[0], chunk):
            key, sub = jax.random.split(key)
            buf = fill(buf, sub, jnp.int32(r0), min(chunk, shape[0] - r0))
        buf.block_until_ready()
        return buf

    def run(m, b, label):
        cols = codec.encoded_row_width(1024, b)
        c_pad = -(-cols // respond_pallas.LANE) * respond_pallas.LANE
        m_pad = -(-m // tile_k) * tile_k
        hb = hi_bits(b)
        pack = hi_pack_factor(b) if hb > 0 else 0
        pc = (c_pad // pack if pack > 1 else c_pad) if hb > 0 else 0
        t0 = time.perf_counter()
        lo = gen((m_pad, c_pad), jnp.int8, fill_i8, 0x20 + b)
        hi = gen((m_pad, pc), jnp.uint8, fill_u8, 0x99 + b) if hb else None
        nbytes = lo.nbytes + (hi.nbytes if hi is not None else 0)
        pdb = respond_pallas.PallasDB(lo, hi, b, m, cols, tile_k)
        server = Server("jax", pdb, m, cols, b, "packed")
        q = np.random.default_rng(0xD15C).integers(
            0, 1 << 32, size=(1, m), dtype=np.uint32)
        scan_s = make_respond_chain(server)(q, 1)
        print(f"{label}: m_pad={m_pad} c_pad={c_pad} pc={pc} "
              f"planes {nbytes/1e9:.2f} GB (gen {time.perf_counter()-t0:.0f}s)  "
              f"{scan_s*1e3:.3f} ms/scan  actual-HBM {nbytes/scan_s/1e9:.1f} GB/s",
              flush=True)
        lo.delete()
        if hi is not None:
            hi.delete()

    _, _, m20 = filter_geometry(3, 1 << 20)
    _, _, m23 = filter_geometry(3, 1 << 23)
    for m, mlab in ((m20, "m20"), (m23, "m23")):
        for b in (8, 9):
            run(m, b, f"{mlab} b={b} ({'lo-only' if b == 8 else 'lo+hi'})")


if __name__ == "__main__":
    main()
