"""Multi-chip scaling: device meshes, sharded respond and setup."""

from .sharding import (
    make_mesh,
    pad_db_planes,
    shard_db_planes,
    sharded_respond_fn,
    sharded_hint_accumulate_fn,
)

__all__ = [
    "make_mesh",
    "pad_db_planes",
    "shard_db_planes",
    "sharded_respond_fn",
    "sharded_hint_accumulate_fn",
]
