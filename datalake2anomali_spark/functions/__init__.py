from .exact import davg, dsum, DSUM_SQL, DAVG_SQL

__all__ = ["davg", "dsum", "DSUM_SQL", "DAVG_SQL"]
