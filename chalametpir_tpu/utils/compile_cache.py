"""Persistent XLA compilation cache.

The heavy device programs here (the Pallas Keccak PRG, the packed
respond kernel) cost seconds-to-tens-of-seconds to compile but are
byte-stable across processes, so a serving deployment should only ever
pay that once per machine. JAX ships a content-addressed persistent
cache; this module turns it on with sane defaults the first time any
device path runs.

NOTE — documented process-global side effects (also disableable): the
first Server.setup/Client.setup on a device sets three JAX config knobs
for the whole process: the persistent cache dir, the min-compile-time /
min-entry-size thresholds, and
`jax_include_full_tracebacks_in_locations=False` (full tracebacks bake
caller source locations into Pallas/Mosaic kernel payloads, making the
cache key change on ANY caller edit — measured as fresh multi-minute
remote compiles before this was traced down). Embedding applications
that need different settings should either set them after the first
setup call or opt out entirely.

The default cache path embeds a machine fingerprint (CPU ISA + JAX
version + backend), so AOT artifacts compiled on a different host are
never loaded (XLA warns 'could lead to execution errors such as SIGILL'
when CPU feature sets mismatch).

Opt out with CHALAMETPIR_NO_COMPILE_CACHE=1 or point the cache somewhere
else with CHALAMETPIR_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DONE = False


def _machine_fingerprint() -> str:
    """Short digest of everything that makes compiled artifacts
    host-specific: CPU flags (ISA features), JAX version, backend."""
    parts = [platform.machine(), platform.processor() or ""]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    try:
        import jax

        parts.append(jax.__version__)
        parts.append(jax.default_backend())
    except Exception:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache() -> None:
    """Idempotently enable JAX's persistent compilation cache."""
    global _DONE
    if _DONE or os.environ.get("CHALAMETPIR_NO_COMPILE_CACHE", "") not in ("", "0"):
        _DONE = True
        return
    _DONE = True
    try:
        import jax

        cache_dir = os.environ.get("CHALAMETPIR_COMPILE_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"),
            ".cache",
            "chalametpir_tpu",
            f"xla_cache_{_machine_fingerprint()}",
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took measurable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # pragma: no cover - never let caching break serving
        pass
