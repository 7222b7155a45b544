from .parquet_io import StateStore, read_parquet_or_empty
from .sinks import append_facts, retention_purge

__all__ = ["StateStore", "read_parquet_or_empty", "append_facts", "retention_purge"]
