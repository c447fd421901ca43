from .registry import REGISTRY, oracle_map, query, query_map  # noqa: F401
