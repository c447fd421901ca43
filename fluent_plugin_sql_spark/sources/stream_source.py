"""Structured-Streaming-native incremental table source (SURVEY §3.1).

The reference's in_sql poll loop (in_sql.rb:131-158) re-expressed as a
REAL Spark streaming source via the Python DataSource API (Spark 4+):
each micro-batch is one poll — ``WHERE update_column > watermark ORDER BY
update_column LIMIT select_limit`` — and the watermark OFFSET lives in
Spark's own streaming checkpoint, so a restarted query resumes exactly
where the last committed batch ended (T6 state recovery without the
engine's file-based StateStore).

Scale/design notes:
- ``SimpleDataSourceStreamReader`` reads driver-side in Python.  That is
  the right shape for THIS source: the reference's poll is a single
  connection fetching ≤ select_limit rows per tick (README.md:100-102) —
  a deliberately tiny trickle that feeds a fan-out pipeline.  The heavy
  lifting (joins/aggs over the emitted stream) happens downstream on
  executors.  A partitioned ``DataSourceStreamReader`` (executor-side
  range-sliced reads) is the upgrade path for bulk backfills.
- The parquet "table" here stands in for the RDBMS table exactly like
  the reference's sqlite fixtures stand in for PostgreSQL in its tests;
  rows are read with pyarrow and filtered/sorted/limited before emission.
- Offsets are JSON dicts (the DataSource contract).  Typed watermarks
  (timestamps) are ISO-serialized with a type tag, mirroring
  ``state._encode_value``.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

FORMAT_NAME = "sql_incremental"


def _encode_offset_value(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return {"$t": "timestamp", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$t": "date", "v": v.isoformat()}
    return v


def _decode_offset_value(v: Any) -> Any:
    if isinstance(v, dict) and "$t" in v:
        if v["$t"] == "timestamp":
            return _dt.datetime.fromisoformat(v["v"])
        if v["$t"] == "date":
            return _dt.date.fromisoformat(v["v"])
    return v


def _arrow_to_spark_ddl(schema) -> str:
    """Minimal pyarrow→Spark DDL mapping for the table types this engine
    reads (TESTDATA.md tables + typical RDBMS scalar columns)."""
    import pyarrow as pa

    parts = []
    for field in schema:
        t = field.type
        if pa.types.is_int64(t):
            s = "bigint"
        elif pa.types.is_int32(t):
            s = "int"
        elif pa.types.is_float64(t):
            s = "double"
        elif pa.types.is_float32(t):
            s = "float"
        elif pa.types.is_boolean(t):
            s = "boolean"
        elif pa.types.is_timestamp(t):
            s = "timestamp"
        elif pa.types.is_date(t):
            s = "date"
        elif pa.types.is_decimal(t):
            s = f"decimal({t.precision},{t.scale})"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            s = "string"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            s = "binary"
        else:
            raise ValueError(f"unsupported column type for streaming source: {t}")
        parts.append(f"`{field.name}` {s}")
    return ", ".join(parts)


class _IncrementalPollReader(SimpleDataSourceStreamReader):
    """One micro-batch = one reference poll (strict ``>`` watermark,
    ascending order, row cap) over a parquet table directory/file."""

    def __init__(self, path: str, update_column: str, select_limit: int):
        self.path = path
        self.update_column = update_column
        self.select_limit = select_limit

    # -- offset contract ---------------------------------------------------
    def initialOffset(self) -> dict:
        return {"last": None}

    def _poll(self, last: Any, upper: Any | None = None):
        """rows with update_column in (last, upper]  (upper=None ⇒ +∞),
        ascending, capped at select_limit unless replaying to ``upper``."""
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        dataset = ds.dataset(self.path, format="parquet")
        filt = None
        col = pc.field(self.update_column)
        if last is not None:
            filt = col > _as_arrow_scalar(last)
        if upper is not None:
            hi = col <= _as_arrow_scalar(upper)
            filt = hi if filt is None else (filt & hi)
        table = dataset.to_table(filter=filt)
        table = table.sort_by(self.update_column)
        if upper is None:
            table = table.slice(0, self.select_limit)
        return table

    def _rows(self, table) -> Iterator[Tuple]:
        # Spark's prefetch cache copy.copy()s this iterator between the
        # planning and execution phases — a generator is not copyable, a
        # list iterator is (and the batch is ≤ select_limit rows anyway).
        rows: list[Tuple] = []
        for batch in table.to_batches():
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            rows.extend(zip(*cols))
        return iter(rows)

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        last = _decode_offset_value(start.get("last"))
        table = self._poll(last)
        if table.num_rows == 0:
            return iter(()), start
        new_last = table.column(self.update_column)[table.num_rows - 1].as_py()
        return self._rows(table), {"last": _encode_offset_value(new_last)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay for recovery: the half-open watermark
        interval (start, end] re-selects exactly the original batch."""
        last = _decode_offset_value(start.get("last"))
        upper = _decode_offset_value(end.get("last"))
        return self._rows(self._poll(last, upper))


def _as_arrow_scalar(v: Any):
    import pyarrow as pa

    if isinstance(v, _dt.datetime):
        return pa.scalar(v, type=pa.timestamp("us"))
    return pa.scalar(v)


class SQLIncrementalDataSource(DataSource):
    """``spark.readStream.format("sql_incremental")`` — options:

    - ``path``: parquet table directory/file to tail
    - ``update_column``: monotonically-growing watermark column
      (reference update_column, in_sql.rb:45-47)
    - ``select_limit``: max rows per micro-batch (in_sql.rb:51-52)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str | StructType:
        import pyarrow.dataset as ds

        return _arrow_to_spark_ddl(
            ds.dataset(self.options["path"], format="parquet").schema
        )

    def simpleStreamReader(self, schema: StructType) -> _IncrementalPollReader:
        return _IncrementalPollReader(
            self.options["path"],
            self.options.get("update_column", "id"),
            int(self.options.get("select_limit", 500)),
        )


def register(spark) -> None:
    """Idempotent registration of the streaming source format."""
    spark.dataSource.register(SQLIncrementalDataSource)


def incremental_stream(spark, path: str, update_column: str, select_limit: int = 500):
    """readStream handle tailing ``path`` with reference poll semantics;
    pair with ``writeStream.option('checkpointLocation', ...)`` so the
    watermark offset is checkpoint-managed."""
    register(spark)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("path", path)
        .option("update_column", update_column)
        .option("select_limit", str(select_limit))
        .load()
    )
