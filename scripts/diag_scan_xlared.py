"""Independent-kernel control: time a plain XLA int8->int32 column
reduction (read-everything, no pallas) over the same 1.36 GB vs
10.87 GB planes diag_scan_xgeom.py used. If XLA's own reduction shows
the same ~6-8% rate drop at the large footprint, the drop is the
memory system (HBM behavior at ~11 GB working sets), conclusively not
the respond kernel."""
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    chunk = 1 << 19

    @partial(jax.jit, donate_argnums=0, static_argnames=("rows",))
    def fill_i8(buf, key, r0, rows):
        bits = jax.random.bits(key, (rows, buf.shape[1]), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(
            buf, jax.lax.bitcast_convert_type(bits, jnp.int8),
            (r0, jnp.int32(0)))

    import numpy as np

    # chained reductions INSIDE one jit (fori_loop with a serializing
    # scalar dependency), scalar result read back — the same slope
    # discipline as bench.make_respond_chain; anything call-per-rep is
    # meaningless on this tunnel (the queue acks before completion)
    @partial(jax.jit, static_argnames=("k",))
    def chain_sum(x, k):
        def body(i, salt):
            s = jnp.sum((x ^ salt).astype(jnp.int32))
            return (s & 1).astype(jnp.int8)

        return jax.lax.fori_loop(0, k, body, jnp.int8(0))

    def timed(buf, k):
        t0 = time.perf_counter()
        np.asarray(chain_sum(buf, k))
        return time.perf_counter() - t0

    for m_pad, label in ((1179648, "m20-size"), (9437184, "m23-size")):
        buf = jnp.full((m_pad, 1152), -128, jnp.int8)
        key = jax.random.PRNGKey(7)
        for r0 in range(0, m_pad, chunk):
            key, sub = jax.random.split(key)
            buf = fill_i8(buf, sub, jnp.int32(r0), min(chunk, m_pad - r0))
        buf.block_until_ready()
        # chain lengths sized so the slope spans >=100 ms of compute —
        # the tunnel's ~30 ms RTT constant drifts +-10 ms and would
        # swamp a short chain's difference
        est_ms = buf.nbytes / 700e9 * 1e3
        k_lo, k_hi = 2, 2 + max(8, int(round(120 / est_ms)))
        timed(buf, k_lo)  # compile + warm
        timed(buf, k_hi)
        best = min(
            (timed(buf, k_hi) - timed(buf, k_lo)) / (k_hi - k_lo)
            for _ in range(3)
        )
        print(f"{label}: {buf.nbytes/1e9:.2f} GB  {best*1e3:.3f} ms/red  "
              f"{buf.nbytes/best/1e9:.1f} GB/s", flush=True)
        buf.delete()


if __name__ == "__main__":
    main()
