"""Multi-chip scaling: device meshes, sharded respond and setup.

Multi-host (multi-process) serving lives in `.multihost` (imported
lazily — joining the multi-controller runtime is an explicit act)."""

from .sharding import (
    build_sharded_pallas_db,
    make_mesh,
    pad_db_planes,
    shard_db_planes,
    sharded_hint_accumulate_fn,
    sharded_hint_ctr_packed,
    sharded_hint_packed_fn,
    sharded_respond_fn,
    sharded_respond_packed_fn,
)

__all__ = [
    "make_mesh",
    "pad_db_planes",
    "shard_db_planes",
    "sharded_respond_fn",
    "sharded_hint_accumulate_fn",
    "build_sharded_pallas_db",
    "sharded_respond_packed_fn",
    "sharded_hint_packed_fn",
    "sharded_hint_ctr_packed",
]
