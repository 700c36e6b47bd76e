"""Multi-device sharding on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from chalametpir_tpu.ops import digits
from chalametpir_tpu.ops.respond import respond_batch_np
from chalametpir_tpu.parallel import (
    make_mesh,
    shard_db_planes,
    sharded_hint_accumulate_fn,
    sharded_respond_fn,
)


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=2, model=4)


def test_sharded_respond_exact(mesh, rng):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, m, c = 4, 512, 40
    queries = rng.integers(0, 1 << 32, size=(q, m), dtype=np.uint32)
    db = rng.integers(0, 1 << 12, size=(m, c), dtype=np.uint32)
    p0, p1 = digits.db_digit_planes_np(db)
    d0, d1 = shard_db_planes(mesh, p0, p1)
    respond = sharded_respond_fn(mesh)
    q_sharded = jax.device_put(queries, NamedSharding(mesh, P("data", "model")))
    got = np.asarray(respond(q_sharded, d0, d1))
    assert np.array_equal(got, respond_batch_np(queries, db))


def test_sharded_respond_with_padding(mesh, rng):
    # m not divisible by the model axis: planes are zero-padded
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, m, c = 2, 509, 24
    queries = rng.integers(0, 1 << 32, size=(q, m), dtype=np.uint32)
    db = rng.integers(0, 1 << 10, size=(m, c), dtype=np.uint32)
    p0, p1 = digits.db_digit_planes_np(db)
    d0, d1 = shard_db_planes(mesh, p0, p1)
    m_pad = d0.shape[0]
    q_pad = np.pad(queries, ((0, 0), (0, m_pad - m)))
    respond = sharded_respond_fn(mesh)
    q_sharded = jax.device_put(q_pad, NamedSharding(mesh, P("data", "model")))
    got = np.asarray(respond(q_sharded, d0, d1))
    assert np.array_equal(got, respond_batch_np(queries, db))


def test_sharded_hint_accumulate_exact(mesh, rng):
    import jax.numpy as jnp

    r, m, c = 16, 256, 24
    a = rng.integers(0, 1 << 32, size=(r, m), dtype=np.uint32)
    db = rng.integers(0, 1 << 12, size=(m, c), dtype=np.uint32)
    p0, p1 = digits.db_digit_planes_np(db)
    d0, d1 = shard_db_planes(mesh, p0, p1)
    step = sharded_hint_accumulate_fn(mesh)
    acc = jnp.zeros((r, c), jnp.int32)
    half = m // 2
    acc = step(acc, a[:, :half], d0[:half], d1[:half])
    acc = step(acc, a[:, half:], d0[half:], d1[half:])
    want = (a.astype(np.uint64) @ db.astype(np.uint64)).astype(np.uint32)
    assert np.array_equal(np.asarray(acc).astype(np.uint32), want)
