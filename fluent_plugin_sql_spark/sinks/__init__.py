from .router import SQLOutput, apply_column_mapping, route_expr  # noqa: F401
