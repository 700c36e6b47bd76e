"""Paired A/B test: strided-2D vs tile-contiguous-3D qd at the 2^23
geometry, measurements INTERLEAVED (2d,3d)x6 so session drift cannot
masquerade as a layout effect. diag_scan_qdlayout.py saw a 19% 3d win
at m23 (708 vs 843 GB/s); diag_scan_qdsweep.py (different allocation
history, later session) saw a dead tie at 758. If the paired deltas
here are ~zero, the layout is rate-neutral at m23 and both earlier
results were environment; if consistently nonzero, the layout matters
and the sweep's tie was placement luck.
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from chalametpir_tpu.core.filter import filter_geometry
    from chalametpir_tpu.ops import respond_pallas

    tile_k = 2048
    c_pad = 1152
    chunk = 1 << 19

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill_i8(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(
            buf, jax.lax.bitcast_convert_type(bits, jnp.int8),
            (r0, jnp.int32(0)))

    @partial(jax.jit, static_argnames=("k", "tile_k"))
    def chain(qd, lo, k, tile_k):
        def body(i, qd):
            out = respond_pallas._run_lo_only(qd, lo, tile_k, False)
            return qd ^ (jnp.max(out) & 1).astype(jnp.int8)

        return jnp.max(jax.lax.fori_loop(0, k, body, qd))

    def timed(qd, lo, k):
        t0 = time.perf_counter()
        np.asarray(chain(qd, lo, k, tile_k))
        return time.perf_counter() - t0

    rng = np.random.default_rng(0xD15C)
    _, _, m = filter_geometry(3, 1 << 23)
    m_pad = -(-m // tile_k) * tile_k
    lo = jnp.full((m_pad, c_pad), -128, jnp.int8)
    key = jax.random.PRNGKey(0x5C)
    for r0 in range(0, m_pad, chunk):
        key, sub = jax.random.split(key)
        lo = fill_i8(lo, sub, jnp.int32(r0), min(chunk, m_pad - r0))
    lo.block_until_ready()
    qd2 = jnp.asarray(rng.integers(-128, 128, size=(32, m_pad), dtype=np.int8))
    qd3 = qd2.reshape(32, m_pad // tile_k, tile_k).transpose(1, 0, 2)
    k_lo, k_hi = 2, 12
    for qd in (qd2, qd3):  # compile + warm both
        timed(qd, lo, k_lo)
        timed(qd, lo, k_hi)
    nb = lo.nbytes
    for rep in range(6):
        pair = []
        for label, qd in (("2d", qd2), ("3d", qd3)):
            s = (timed(qd, lo, k_hi) - timed(qd, lo, k_lo)) / (k_hi - k_lo)
            pair.append(f"{label} {s*1e3:7.3f} ms {nb/s/1e9:6.1f} GB/s")
        print(f"rep{rep}: " + "  |  ".join(pair), flush=True)


if __name__ == "__main__":
    main()
