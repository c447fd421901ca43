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


def compact_parquet_dir(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction for append-heavy parquet sinks (a streaming
    ``foreachBatch``/file sink accretes one file per micro-batch per
    partition — thousands of tiny files kill scan planning long before
    they kill I/O).

    Rewrites the directory to ``ceil(rows / target_rows_per_file)`` files
    (optionally sorted, so downstream range predicates benefit from
    parquet row-group min/max pruning), staging into a sibling directory
    and atomically renaming.  The swap window is a directory rename —
    concurrent READERS of the old listing are fine; pause writers (or
    compact between polls) since appends during compaction would be lost.
    Returns the new file count.

    At real scale this is the nightly-compaction shape; table formats
    (Delta/Iceberg OPTIMIZE) do the same rewrite transactionally.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    if sort_cols:
        # repartitionByRange + sortWithinPartitions → globally range-
        # clustered files, ideal for min/max pruning on sort_cols
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    staging = path.rstrip("/") + ".__compact_tmp__"
    out.write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + ".__compact_old__"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return n_files
