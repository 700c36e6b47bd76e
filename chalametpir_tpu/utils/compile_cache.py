"""Persistent XLA compilation cache.

The heavy device programs here (the Pallas Keccak PRG, the packed
respond kernel) cost seconds-to-tens-of-seconds to compile but are
byte-stable across processes, so a serving deployment should only ever
pay that once per machine. JAX ships a content-addressed persistent
cache; this module turns it on with sane defaults the first time any
device path runs.

Opt out with CHALAMETPIR_NO_COMPILE_CACHE=1 or point the cache somewhere
else with CHALAMETPIR_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache() -> None:
    """Idempotently enable JAX's persistent compilation cache."""
    global _DONE
    if _DONE or os.environ.get("CHALAMETPIR_NO_COMPILE_CACHE", "") not in ("", "0"):
        _DONE = True
        return
    _DONE = True
    cache_dir = os.environ.get("CHALAMETPIR_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "chalametpir_tpu", "xla_cache"
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took measurable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # full tracebacks bake CALLER source locations into the serialized
        # program (inside Pallas/Mosaic kernel payloads the cache key
        # cannot canonicalize away), so any edit to any caller produced a
        # different key and a fresh multi-minute remote compile — measured
        # repeatedly before this was traced down
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # pragma: no cover - never let caching break serving
        pass
