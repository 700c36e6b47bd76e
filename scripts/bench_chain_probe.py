"""Probe: compile+run the lean respond-chain at headline shapes on TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from chalametpir_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
from chalametpir_tpu.ops.respond_pallas import (
    PallasDB,
    _prepare_query_digits,
    _run_with_hi,
)

m, c, b = 1179648, 940, 9
m_pad = -(-m // 512) * 512
db = PallasDB(
    jnp.zeros((m_pad, 1024), jnp.int8),
    jnp.zeros((m_pad, 128), jnp.uint8),
    b, m, c, 512,
)


def _scan(qd):
    return _run_with_hi(qd, db.lo, db.hi, db.tile_k, 8, 1, False)[0]


@jax.jit
def leanloop(qd, k):
    def body(i, qd):
        out = _scan(qd)
        return qd ^ (jnp.max(out) & 1).astype(jnp.int8)

    return jnp.max(jax.lax.fori_loop(0, k, body, qd))


qd, _ = _prepare_query_digits(jnp.zeros((1, m), jnp.uint32), m_pad)
t0 = time.perf_counter()
v = float(np.asarray(leanloop(qd, 1)))
print(f"lean compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
for k in (4, 24):
    t0 = time.perf_counter()
    v = float(np.asarray(leanloop(qd, k)))
    print(f"k={k}: {time.perf_counter()-t0:.3f}s", flush=True)
