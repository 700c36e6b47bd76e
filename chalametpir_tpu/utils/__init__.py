from .kvdb import generate_random_kv_database

__all__ = ["generate_random_kv_database"]
