"""Map the qd-layout crossover: strided-2D vs tile-contiguous-3D query
digits at every bench plane height, both kernel variants, one session.

diag_scan_qdlayout.py found 3D wins 19% at m23 (843 vs 708 GB/s) but
loses ~5% at m20 (758 vs 799) — the production kernel needs the
threshold. b per regime matches the real bench geometry (b=9 lo+hi at
2^20..2^22, b=8 lo-only at 2^23); each height also runs the OTHER
variant as a control.
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp

    from chalametpir_tpu.core.filter import filter_geometry
    from chalametpir_tpu.ops import respond_pallas
    from chalametpir_tpu.ops.packed import hi_bits, hi_pack_factor

    tile_k = 2048
    chunk = 1 << 19

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        if buf.dtype == jnp.int8:
            bits = jax.lax.bitcast_convert_type(bits, jnp.int8)
        return jax.lax.dynamic_update_slice(buf, bits, (r0, jnp.int32(0)))

    def gen(shape, dtype):
        buf = jnp.zeros(shape, dtype)
        key = jax.random.PRNGKey(shape[0] & 0xFFFF)
        for r0 in range(0, shape[0], chunk):
            key, sub = jax.random.split(key)
            buf = fill(buf, sub, jnp.int32(r0), min(chunk, shape[0] - r0))
        return buf.block_until_ready()

    def _k3d_lo(qd_ref, lo_ref, out_ref):
        i = pl.program_id(0)
        p = jnp.dot(qd_ref[0], lo_ref[:], preferred_element_type=jnp.int32)

        @pl.when(i == 0)
        def _():
            out_ref[:] = p

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + p

    def _k3d_hi(pack, bits, qd_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        i = pl.program_id(0)
        qd = qd_ref[0]
        p_lo = jnp.dot(qd, lo_ref[:], preferred_element_type=jnp.int32)
        hp = hi_ref[:].astype(jnp.int32)
        mask = (1 << bits) - 1
        parts = [((hp >> (bits * j)) & mask).astype(jnp.int8) for j in range(pack)]
        hi = jnp.concatenate(parts, axis=1)
        p_hi = jnp.dot(qd[: out_hi_ref.shape[0], :], hi,
                       preferred_element_type=jnp.int32)

        @pl.when(i == 0)
        def _():
            out_lo_ref[:] = p_lo
            out_hi_ref[:] = p_hi

        @pl.when(i > 0)
        def _():
            out_lo_ref[:] = out_lo_ref[:] + p_lo
            out_hi_ref[:] = out_hi_ref[:] + p_hi

    @partial(jax.jit, static_argnames=("tile_k",))
    def run3d_lo(qd3, lo, tile_k):
        n_tiles, qd_rows, _ = qd3.shape
        return pl.pallas_call(
            _k3d_lo,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, qd_rows, tile_k), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile_k, lo.shape[1]), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((qd_rows, lo.shape[1]), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((qd_rows, lo.shape[1]), jnp.int32),
        )(qd3, lo)

    @partial(jax.jit, static_argnames=("tile_k", "pack", "bits"))
    def run3d_hi(qd3, lo, hi, tile_k, pack, bits):
        n_tiles, qd_rows, _ = qd3.shape
        c_pad, pc = lo.shape[1], hi.shape[1]
        qh_rows = qd_rows - qd_rows // 4
        return pl.pallas_call(
            partial(_k3d_hi, pack, bits),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, qd_rows, tile_k), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile_k, c_pad), lambda i: (i, 0)),
                pl.BlockSpec((tile_k, pc), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((qd_rows, c_pad), lambda i: (0, 0)),
                pl.BlockSpec((qh_rows, c_pad), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qd_rows, c_pad), jnp.int32),
                jax.ShapeDtypeStruct((qh_rows, c_pad), jnp.int32),
            ],
        )(qd3, lo, hi)

    @partial(jax.jit, static_argnames=("k", "variant", "tile_k", "pack", "bits"))
    def chain(qd, lo, hi, k, variant, tile_k, pack, bits):
        def body(i, qd):
            if hi is None:
                if variant == "2d":
                    out = respond_pallas._run_lo_only(qd, lo, tile_k, False)
                else:
                    out = run3d_lo(qd, lo, tile_k)
                sig = jnp.max(out)
            else:
                if variant == "2d":
                    o1, o2 = respond_pallas._run_with_hi(
                        qd, lo, hi, tile_k, pack, bits, False)
                else:
                    o1, o2 = run3d_hi(qd, lo, hi, tile_k, pack, bits)
                sig = jnp.max(o1) ^ jnp.max(o2)
            return qd ^ (sig & 1).astype(jnp.int8)

        return jnp.max(jax.lax.fori_loop(0, k, body, qd))

    def timed(qd, lo, hi, k, variant, pack, bits):
        t0 = time.perf_counter()
        np.asarray(chain(qd, lo, hi, k, variant, tile_k, pack, bits))
        return time.perf_counter() - t0

    rng = np.random.default_rng(0xD15C)
    for log_n, b in ((20, 9), (21, 9), (22, 9), (23, 8)):
        _, _, m = filter_geometry(3, 1 << log_n)
        m_pad = -(-m // tile_k) * tile_k
        c_pad = 1024 if b == 9 else 1152
        hb = hi_bits(b)
        pack = hi_pack_factor(b) if hb else 0
        bits = (8 // pack if pack > 1 else 8) if pack else 0
        lo = gen((m_pad, c_pad), jnp.int8)
        hi = gen((m_pad, c_pad // pack), jnp.uint8) if hb else None
        nbytes = lo.nbytes + (hi.nbytes if hi is not None else 0)
        qd2 = jnp.asarray(
            rng.integers(-128, 128, size=(32, m_pad), dtype=np.int8))
        qd3 = qd2.reshape(32, m_pad // tile_k, tile_k).transpose(1, 0, 2)
        est_ms = nbytes / 700e9 * 1e3
        k_lo, k_hi = 2, 2 + max(8, int(round(150 / est_ms)))
        for variant, qd in (("2d", qd2), ("3d", qd3)):
            timed(qd, lo, hi, k_lo, variant, pack, bits)
            timed(qd, lo, hi, k_hi, variant, pack, bits)
            best = min(
                (timed(qd, lo, hi, k_hi, variant, pack, bits)
                 - timed(qd, lo, hi, k_lo, variant, pack, bits))
                / (k_hi - k_lo)
                for _ in range(3)
            )
            print(f"m{log_n} b={b} qd-{variant}: {nbytes/1e9:.2f} GB  "
                  f"{best*1e3:.3f} ms/scan  "
                  f"actual-HBM {nbytes/best/1e9:.1f} GB/s", flush=True)
        lo.delete()
        if hi is not None:
            hi.delete()


if __name__ == "__main__":
    main()
