"""Probe the last live hypothesis for the m-dependent scan-rate drop:
the query-digit operand layout.

diag_scan_xlared.py showed plain XLA reads run FLAT (~756 GB/s) across
the 1.36 GB vs 10.87 GB footprints, refuting the memory-system theory;
diag_scan_xgeom.py showed BOTH kernel variants drop ~6-8% at the large
footprint. The one input whose access pattern changes with m is qd: the
kernel reads block (32, tile_k) out of a row-major (32, m_pad) array,
i.e. 32 segments of tile_k bytes strided m_pad apart — 1.2 MB strides
at m20 vs 9.4 MB at m23. This script times the SAME lo-only kernel with
qd in (a) the current strided 2D layout and (b) a tile-contiguous 3D
layout (n_tiles, 32, tile_k) where each grid step's block is one
contiguous 64 KB read, at both plane heights in one session.
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

    tile_k = 2048
    c_pad = 1152
    chunk = 1 << 19

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill_i8(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(
            buf, jax.lax.bitcast_convert_type(bits, jnp.int8),
            (r0, jnp.int32(0)))

    def _kernel_q3d(qd_ref, lo_ref, out_ref):
        i = pl.program_id(0)
        p = jnp.dot(qd_ref[0], lo_ref[:], preferred_element_type=jnp.int32)

        @pl.when(i == 0)
        def _():
            out_ref[:] = p

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + p

    @partial(jax.jit, static_argnames=("tile_k",))
    def run_q3d(qd3, lo, tile_k):
        n_tiles, qd_rows, _ = qd3.shape
        return pl.pallas_call(
            _kernel_q3d,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, qd_rows, tile_k), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile_k, lo.shape[1]), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((qd_rows, lo.shape[1]), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((qd_rows, lo.shape[1]), jnp.int32),
        )(qd3, lo)

    @partial(jax.jit, static_argnames=("k", "variant", "tile_k"))
    def chain(qd, lo, k, variant, tile_k):
        def body(i, qd):
            if variant == "2d":
                out = respond_pallas._run_lo_only(qd, lo, tile_k, False)
            else:
                out = run_q3d(qd, lo, tile_k)
            return qd ^ (jnp.max(out) & 1).astype(jnp.int8)

        return jnp.max(jax.lax.fori_loop(0, k, body, qd))

    def timed(qd, lo, k, variant):
        t0 = time.perf_counter()
        np.asarray(chain(qd, lo, k, variant, tile_k))
        return time.perf_counter() - t0

    rng = np.random.default_rng(0xD15C)
    _, _, m20 = filter_geometry(3, 1 << 20)
    _, _, m23 = filter_geometry(3, 1 << 23)
    for m, mlab in ((m20, "m20"), (m23, "m23")):
        m_pad = -(-m // tile_k) * tile_k
        lo = jnp.full((m_pad, c_pad), -128, jnp.int8)
        key = jax.random.PRNGKey(0x5C)
        for r0 in range(0, m_pad, chunk):
            key, sub = jax.random.split(key)
            lo = fill_i8(lo, sub, jnp.int32(r0), min(chunk, m_pad - r0))
        lo.block_until_ready()
        qd2 = jnp.asarray(
            rng.integers(-128, 128, size=(32, m_pad), dtype=np.int8))
        qd3 = qd2.reshape(32, m_pad // tile_k, tile_k).transpose(1, 0, 2)
        est_ms = lo.nbytes / 700e9 * 1e3
        k_lo, k_hi = 2, 2 + max(8, int(round(150 / est_ms)))
        for variant, qd in (("2d", qd2), ("3d", qd3)):
            timed(qd, lo, k_lo, variant)  # compile + warm
            timed(qd, lo, k_hi, variant)
            best = min(
                (timed(qd, lo, k_hi, variant) - timed(qd, lo, k_lo, variant))
                / (k_hi - k_lo)
                for _ in range(3)
            )
            print(f"{mlab} qd-{variant}: {lo.nbytes/1e9:.2f} GB  "
                  f"{best*1e3:.3f} ms/scan  "
                  f"actual-HBM {lo.nbytes/best/1e9:.1f} GB/s", flush=True)
        lo.delete()


if __name__ == "__main__":
    main()
