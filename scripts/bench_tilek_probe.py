import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from chalametpir_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from chalametpir_tpu.ops.respond_pallas import PallasDB, _prepare_query_digits, _run_with_hi

m, c, b = 1179648, 940, 9
for tile_k in (512, 1024, 2048):
    m_pad = -(-m // tile_k) * tile_k
    db = PallasDB(jnp.zeros((m_pad, 1024), jnp.int8), jnp.zeros((m_pad, 128), jnp.uint8), b, m, c, tile_k)
    def _scan(qd, db=db, tile_k=tile_k):
        return _run_with_hi(qd, db.lo, db.hi, tile_k, 8, 1, False)[0]
    @jax.jit
    def leanloop(qd, k, _scan=_scan):
        def body(i, qd):
            out = _scan(qd)
            return qd ^ (jnp.max(out) & 1).astype(jnp.int8)
        return jnp.max(jax.lax.fori_loop(0, k, body, qd))
    qd, _ = _prepare_query_digits(jnp.zeros((1, m), jnp.uint32), m_pad)
    t0 = time.perf_counter()
    float(np.asarray(leanloop(qd, 1)))
    tc = time.perf_counter() - t0
    ts = {}
    for k in (4, 24):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(leanloop(qd, k))); best = min(best, time.perf_counter()-t0)
        ts[k] = best
    slope = (ts[24]-ts[4])/20
    print(f"tile_k={tile_k}: compile {tc:.1f}s, scan {slope*1e3:.2f} ms = {(m_pad*1024+m_pad*128)/slope/1e9:.0f} GB/s HBM", flush=True)
