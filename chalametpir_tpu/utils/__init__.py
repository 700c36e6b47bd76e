from .compile_cache import enable_compile_cache
from .kvdb import generate_random_kv_database

__all__ = ["generate_random_kv_database", "enable_compile_cache"]
