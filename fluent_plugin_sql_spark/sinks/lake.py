"""Data-lake sinks: partitioned and bucketed parquet.

- ``write_partitioned``: directory-partitioned parquet (``partitionBy``) —
  downstream queries with partition-column predicates scan only matching
  directories (partition pruning, audited in tests).
- ``write_bucketed``: hash-bucketed managed table (``bucketBy`` +
  ``saveAsTable``) — joins/aggregations on the bucket key between
  co-bucketed tables skip the shuffle entirely, the prerequisite for
  repeated co-located joins at 100 TB.

Delta/Iceberg/Hudi would subsume both with ACID + MERGE; their jars are
not in this environment, so plain parquet + the metastore-backed bucketed
table is the lake layer (operators.scale.merge_upsert supplies the MERGE
semantics on top).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned parquet.  Keep partition cardinality sane
    (date/hour/tenant — thousands, not millions of directories); combine
    with ``maxRecordsPerFile`` to bound file sizes under skew."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table.  Two tables bucketed the same way on
    the join key equi-join WITHOUT a shuffle (audited in
    tests/test_lake.py).  ``sortBy`` additionally pre-sorts within buckets
    so sort-merge join skips its sort."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
