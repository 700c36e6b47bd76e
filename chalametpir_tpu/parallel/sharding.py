"""Sharded PIR serving over a jax.sharding.Mesh.

The reference has no multi-device story (its parallelism is rayon
threads + one Vulkan device; SURVEY.md section 2). The TPU-native scaling
design:

* **model axis** — the fingerprint dimension `m` of the encoded DB is
  sharded across chips (a DB too big for one chip's HBM, e.g. the 2^23
  x 1 kB config, splits its digit planes row-wise). Each chip computes a
  partial (Q, C) int32 product over its local rows; a `psum` over ICI
  reduces partials. int32 psum wraps two's-complement, so the reduction
  is exact mod 2^32.
* **data axis** — a batch of queries is sharded across chips; each query
  subset rides the same local DB shard.

The same mesh serves setup: A row blocks are replicated over `data`,
their columns (= m) sharded over `model`, and the hint partials psum'd.

Everything here is shape-polymorphic over the mesh; the driver validates
it on an 8-device virtual CPU mesh via `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.digits import NUM_U32_DIGITS, recode_u32_jnp

_DN = (((1,), (0,)), ((), ()))


def make_mesh(devices=None, data: int | None = None, model: int | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and model is None:
        model = n
        data = 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def pad_db_planes(p0: np.ndarray, p1: np.ndarray, num_shards: int):
    """Zero-pad the m dimension to a multiple of the model axis; zero rows
    contribute nothing to the products."""
    m = p0.shape[0]
    pad = (-m) % num_shards
    if pad:
        p0 = np.pad(p0, ((0, pad), (0, 0)))
        p1 = np.pad(p1, ((0, pad), (0, 0)))
    return p0, p1


def shard_db_planes(mesh: Mesh, p0: np.ndarray, p1: np.ndarray):
    """Place digit planes on the mesh: m sharded over `model`, replicated
    over `data`."""
    p0, p1 = pad_db_planes(p0, p1, mesh.shape["model"])
    sharding = NamedSharding(mesh, P("model", None))
    return jax.device_put(p0, sharding), jax.device_put(p1, sharding)


def _respond_local(queries_u32, d0, d1):
    """Local-shard respond partial: (Q, m_local) x (m_local, C) -> int32."""
    q, m = queries_u32.shape
    qd = recode_u32_jnp(queries_u32)
    p0 = jax.lax.dot_general(
        qd.reshape(NUM_U32_DIGITS * q, m), d0, _DN, preferred_element_type=jnp.int32
    ).reshape(NUM_U32_DIGITS, q, -1)
    p1 = jax.lax.dot_general(
        qd[:3].reshape(3 * q, m), d1, _DN, preferred_element_type=jnp.int32
    ).reshape(3, q, -1)
    out = p0[0]
    for i in range(1, NUM_U32_DIGITS):
        out = out + (p0[i] << (8 * i))
    for i in range(3):
        out = out + (p1[i] << (8 * (i + 1)))
    return out


def sharded_respond_fn(mesh: Mesh):
    """jit'd (Q, m) x planes -> (Q, C) uint32 with queries sharded over
    `data`, m sharded over `model`, exact mod-2^32 psum reduction."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", "model"), P("model", None), P("model", None)),
        out_specs=P("data", None),
    )
    def _respond(queries, d0, d1):
        partial_out = _respond_local(queries, d0, d1)
        return jax.lax.psum(partial_out, "model")

    @jax.jit
    def respond(queries, d0, d1):
        return _respond(queries, d0, d1).astype(jnp.uint32)

    return respond


def sharded_hint_accumulate_fn(mesh: Mesh):
    """jit'd hint-matmul step: acc (R, C) int32 += A_block (R, m) u32 . D.

    A blocks arrive replicated over `data` and column-sharded over
    `model`; the per-shard digit products psum into the full accumulator.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(None, "model"), P("model", None), P("model", None)),
        out_specs=P(None, None),
    )
    def _step(acc, a_u32, d0, d1):
        ad = recode_u32_jnp(a_u32)
        out = acc
        for i in range(NUM_U32_DIGITS):
            out = out + (
                jax.lax.dot_general(ad[i], d0, _DN, preferred_element_type=jnp.int32)
                << (8 * i)
            )
        for i in range(NUM_U32_DIGITS - 1):
            out = out + (
                jax.lax.dot_general(ad[i], d1, _DN, preferred_element_type=jnp.int32)
                << (8 * (i + 1))
            )
        # each model shard holds a partial over its m columns; reduce, then
        # keep a single copy (out_specs replicates)
        return jax.lax.psum(out - acc, "model") + acc

    return jax.jit(_step)
