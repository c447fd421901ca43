"""Tag scalar functions (reference F4/F5, in_sql.rb:71; out_sql.rb:253-259)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import strip_tag_prefix_regex


def add_tag(df: DataFrame, tag: str, prefix: str | None = None, col: str = "tag") -> DataFrame:
    """F4: attach the routing tag, ``prefix.tag`` when a prefix is set
    (in_sql.rb:69-71)."""
    full = f"{prefix}.{tag}" if prefix else tag
    return df.withColumn(col, F.lit(full))


def strip_tag_prefix(col: Column | str, prefix: str) -> Column:
    """F5: anchored prefix strip (out_sql.rb:253-259)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, strip_tag_prefix_regex(prefix), "")
