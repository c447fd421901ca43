from .incremental import IncrementalScan, SQLInput  # noqa: F401
