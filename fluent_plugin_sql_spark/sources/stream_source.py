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
  executors.  For bulk backfills, ``partitioned=true`` selects
  :class:`_PartitionedIncrementalReader` — executor-side range-sliced
  reads planned as ~select_limit-row watermark sub-ranges per task.
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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


def _arrow_to_spark_type(t) -> str:
    """pyarrow→Spark SQL type mapping for the table types this engine
    reads (TESTDATA.md tables + typical RDBMS scalar columns + the
    array/struct shapes of embedding and multimodal tables)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_timestamp(t):
        # tz-less parquet timestamps (Spark INT96, plain TIMESTAMP_MICROS
        # without isAdjustedToUTC) surface as naive datetimes, which
        # Spark's datasource row converter only accepts for NTZ; the
        # session is pinned UTC so values are identical either way, and
        # streaming.ensure_event_time re-casts NTZ before any watermark.
        return "timestamp" if t.tz else "timestamp_ntz"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"array<{_arrow_to_spark_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(
            f"{t.field(i).name}: {_arrow_to_spark_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    raise ValueError(f"unsupported column type for streaming source: {t}")


def _arrow_to_spark_ddl(schema) -> str:
    return ", ".join(f"`{f.name}` {_arrow_to_spark_type(f.type)}" for f in schema)


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
        if upper is None and table.num_rows > self.select_limit:
            # Tiebreak: if the cap would cut through rows SHARING the
            # boundary value, the next poll's strict ``>`` lower bound
            # would skip the cut-off ties forever.  Extend the batch
            # through every row equal to the boundary (slightly exceeding
            # select_limit), mirroring the batch path's tie handling.
            boundary = table.column(self.update_column)[self.select_limit - 1]
            table = table.filter(
                pc.less_equal(table.column(self.update_column), boundary)
            )
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


class _RangeInputPartition(InputPartition):
    """One executor task's slice of a micro-batch: the half-open
    watermark interval ``(lo, hi]`` in ENCODED (json-safe) form — the
    partition object is pickled driver→executor."""

    def __init__(self, lo: Any, hi: Any):
        self.lo = lo
        self.hi = hi


class _PartitionedIncrementalReader(DataSourceStreamReader):
    """Executor-side bulk-backfill variant of the incremental source.

    The Simple reader above is the reference-parity trickle (one
    driver-side poll of ≤ select_limit rows per tick — in_sql.rb:131-158).
    For a BULK backfill that shape funnels every byte through the driver;
    this reader instead plans each micro-batch as value sub-ranges of the
    watermark column and reads them ON EXECUTORS (``read`` runs in tasks):

    - ``latestOffset`` is the table head (max update_column) — a
      single-column pruned scan.  It is monotone, so a restarted query
      can never regress the checkpointed offset (exact resume).
    - ``partitions(start, end)`` splits ``(start, end]`` into contiguous
      DISTINCT-value ranges of ~``select_limit`` rows each (one pruned
      scan of the watermark column + group-count).  select_limit bounds
      rows per TASK here, not per batch — the whole backlog flows in one
      micro-batch across many tasks, the point of a backfill.
    - Ties never split: range bounds sit on distinct values with
      ``(lo, hi]`` semantics, so rows sharing a watermark value always
      land in exactly one partition.
    """

    def __init__(self, path: str, update_column: str, select_limit: int):
        self.path = path
        self.update_column = update_column
        self.select_limit = select_limit
        # per-file max memo: parquet files are IMMUTABLE once committed
        # (streaming/batch writers create new files, never rewrite), so a
        # memoized per-file max can never go stale and per-trigger planning
        # drops from O(files) footer reads forever to O(new files) — at
        # millions of files the difference between a driver that idles and
        # one that re-stats the world every trigger.  Keyed by file path;
        # a restarted driver just re-warms the memo once.
        self._frag_max_cache: dict[str, object] = {}
        self.footer_reads = 0  # observability for tests / tuning

    def initialOffset(self) -> dict:
        return {"last": None}

    def _fragment_max(self, frag) -> object | None:
        """Max of ``update_column`` in one file from ROW-GROUP STATISTICS
        — footer metadata only, no data pages.  Falls back to scanning
        just the watermark column when a footer lacks exact max
        statistics (e.g. truncated string bounds, where the stored max is
        an upper bound that would over-advance the offset and skip rows).
        Returns None for an empty file."""
        import pyarrow.compute as pc

        md = frag.metadata
        idx = next(
            (
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == self.update_column
            ),
            None,
        )
        if idx is not None:
            if md.num_row_groups == 0:
                return None
            frag_max = None
            for r in range(md.num_row_groups):
                st = md.row_group(r).column(idx).statistics
                if (
                    st is None
                    or not st.has_min_max
                    or getattr(st, "is_max_value_exact", True) is False
                ):
                    frag_max = None
                    break
                m = st.max
                frag_max = m if frag_max is None or m > frag_max else frag_max
            if frag_max is not None:
                return frag_max
        tbl = frag.to_table(columns=[self.update_column])
        if tbl.num_rows == 0:
            return None
        return pc.max(tbl.column(0)).as_py()

    def latestOffset(self) -> dict:
        """Table head (max update_column).  Footer statistics are read
        once per FILE ever (see ``_frag_max_cache``), so steady-state
        trigger cost is one directory listing + footers of new files."""
        import pyarrow.dataset as ds

        dataset = ds.dataset(self.path, format="parquet")
        best = None
        for frag in dataset.get_fragments():
            fpath = frag.path
            if fpath in self._frag_max_cache:
                frag_max = self._frag_max_cache[fpath]
            else:
                self.footer_reads += 1
                frag_max = self._fragment_max(frag)
                self._frag_max_cache[fpath] = frag_max
            if frag_max is not None and (best is None or frag_max > best):
                best = frag_max
        if best is None:
            return {"last": None}
        return {"last": _encode_offset_value(best)}

    def partitions(self, start: dict, end: dict) -> list:
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        lo = _decode_offset_value(start.get("last"))
        hi = _decode_offset_value(end.get("last"))
        if hi is None or (lo is not None and not (hi > lo)):
            return []
        dataset = ds.dataset(self.path, format="parquet")
        col = pc.field(self.update_column)
        filt = col <= _as_arrow_scalar(hi)
        if lo is not None:
            filt = (col > _as_arrow_scalar(lo)) & filt
        vals = dataset.to_table(columns=[self.update_column], filter=filt)
        if vals.num_rows == 0:
            return []
        counts = (
            vals.group_by(self.update_column)
            .aggregate([(self.update_column, "count")])
            .sort_by(self.update_column)
        )
        values = counts.column(self.update_column).to_pylist()
        ns = counts.column(f"{self.update_column}_count").to_pylist()
        parts: list[_RangeInputPartition] = []
        prev = start.get("last")
        acc = 0
        for v, n in zip(values, ns):
            acc += n
            if acc >= self.select_limit:
                enc = _encode_offset_value(v)
                parts.append(_RangeInputPartition(prev, enc))
                prev, acc = enc, 0
        if acc > 0 or not parts:
            parts.append(_RangeInputPartition(prev, _encode_offset_value(values[-1])))
        return parts

    def read(self, partition: _RangeInputPartition) -> Iterator[Tuple]:  # type: ignore[override]
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        lo = _decode_offset_value(partition.lo)
        hi = _decode_offset_value(partition.hi)
        dataset = ds.dataset(self.path, format="parquet")
        col = pc.field(self.update_column)
        filt = col <= _as_arrow_scalar(hi)
        if lo is not None:
            filt = (col > _as_arrow_scalar(lo)) & filt
        table = dataset.to_table(filter=filt).sort_by(self.update_column)
        for batch in table.to_batches():
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass


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

    def streamReader(self, schema: StructType) -> _PartitionedIncrementalReader:
        """Executor-side partitioned reads when ``partitioned=true``;
        otherwise falls back (via PySparkNotImplementedError — the
        documented dispatch in datasource_internal._streamReader) to the
        driver-side Simple reader's reference poll semantics."""
        if str(self.options.get("partitioned", "false")).lower() == "true":
            return _PartitionedIncrementalReader(
                self.options["path"],
                self.options.get("update_column", "id"),
                int(self.options.get("select_limit", 500)),
            )
        from pyspark.errors import PySparkNotImplementedError

        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
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


def incremental_stream(
    spark,
    path: str,
    update_column: str,
    select_limit: int = 500,
    partitioned: bool = False,
):
    """readStream handle tailing ``path`` with reference poll semantics;
    pair with ``writeStream.option('checkpointLocation', ...)`` so the
    watermark offset is checkpoint-managed.

    ``partitioned=True`` switches to the executor-side bulk-backfill
    reader (:class:`_PartitionedIncrementalReader`): each micro-batch is
    split into ~select_limit-row watermark ranges read in parallel tasks
    instead of one driver-side poll."""
    register(spark)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("path", path)
        .option("update_column", update_column)
        .option("select_limit", str(select_limit))
        .option("partitioned", "true" if partitioned else "false")
        .load()
    )
