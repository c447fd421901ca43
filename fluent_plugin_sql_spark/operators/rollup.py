"""Incremental rollup store — hypertable-style continuous aggregates.

The reference's poll loop (in_sql.rb:136-161) re-SELECTs raw rows every
interval and leaves aggregation to a downstream fluentd plugin; any
dashboard query over months of history re-reads raw history.  At 100 TB
that recompute is the bottleneck, so this store materializes the classic
timeseries answer: keep ALGEBRAIC PARTIALS (count / sum / min / max /
HLL-sketch) per (time window × dimensions), absorb each micro-batch by
aggregating ONLY the batch and appending its partials, and answer
queries by merging partials — count and sum add, min/max re-min/re-max,
HLL sketches union (Datasketches HLL via ``hll_sketch_agg`` /
``hll_union_agg``, the same partial-merge contract Spark uses internally
for its own two-phase aggregation).

Scale contract (the whole point of the design):

- **absorb** costs O(batch) — one map-side-combinable aggregation of the
  micro-batch, one append.  History is never touched.
- **snapshot** costs O(partials in the queried time range): the state
  table is directory-partitioned by UTC day (``pday``), a time-range
  filter prunes day directories at planning time, and the merge is one
  map-side-combinable aggregation over surviving partials — never the
  raw events.
- **compact** re-merges accumulated per-batch partials so state size
  converges to O(groups), not O(batches x groups), via the same
  crash-safe staging swap as the dedup stores (_StoreFS.recover heals
  interrupted swaps on open).

Exactly-once absorbs (stronger than the dedup stores' at-least-once,
because double-absorbing partials DOUBLE-COUNTS instead of converging):
each absorb writes its partials to a staging dir, then commits with ONE
atomic directory rename to ``data/batch=<batch_id>``.  The rename is the
commit point — a crash before it leaves only unreferenced staging
garbage (swept on open/compact), a replay of a committed batch sees the
directory exists and no-ops.  No marker files, no commit log: the
partition layout IS the ledger.

Built entirely from batch DataFrame ops + Hadoop FS renames — works
unchanged on HDFS/S3A-with-rename-semantics/local.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _StoreFS


def _sanitize_batch_id(batch_id: str) -> str:
    s = str(batch_id)
    if not s or any(c in s for c in "/\\{}:=\n\r\t "):
        raise ValueError(f"batch_id must be a path-safe token, got {s!r}")
    return s


class RollupStore:
    """Continuous aggregate over an event stream.

    Parameters
    ----------
    time_col : event-time column of absorbed batches.
    window : tumbling window width (``F.window`` duration string,
        e.g. ``"1 hour"``).
    dims : grouping dimension columns (beyond the time window).
    sum_cols : numeric columns rolled up as sum/min/max partials.
    hll_cols : columns rolled up as HLL sketches (approx distinct).
        ``lgk`` sizes the sketch (Datasketches lgConfigK; 12 → ~1.6 KB
        per group per column, ±2.2% standard error at any cardinality).

    State: ``{path}/data/batch=<id>/pday=<utc-day>/*.parquet`` with
    columns ``w_start`` (window start), dims, ``rc`` (row count),
    ``s_<c>/mn_<c>/mx_<c>`` per sum col, ``hll_<c>`` per sketch col.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        time_col: str,
        window: str = "1 hour",
        dims: tuple[str, ...] = (),
        sum_cols: tuple[str, ...] = (),
        hll_cols: tuple[str, ...] = (),
        lgk: int = 12,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.time_col = time_col
        self.window = window
        self.dims = tuple(dims)
        self.sum_cols = tuple(sum_cols)
        self.hll_cols = tuple(hll_cols)
        self.lgk = lgk
        self._fs = _StoreFS(spark, self.path)
        self._fs.recover("data")  # heal an interrupted compact swap
        self._sweep_staging()

    # ------------------------------------------------------------------ fs

    def _exists(self) -> bool:
        return self._fs.exists("data")

    def _sweep_staging(self) -> None:
        """Delete uncommitted absorb staging dirs (crash leftovers).
        Safe anytime: a staging dir is unreferenced until its atomic
        rename into ``data/``."""
        jp, fs = self._fs._jpath, self._fs._fs
        root = jp(self.path)
        if not fs.exists(root):
            return
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("_absorb_"):
                fs.delete(st.getPath(), True)

    # ----------------------------------------------------------- partials

    def _partials(self, df: DataFrame) -> DataFrame:
        """Aggregate one batch to partial-state rows — a single
        map-side-combinable groupBy (count/sum/min/max/hll_sketch_agg
        are all partial-mergeable, so Spark's own two-phase hash
        aggregation keeps the shuffle at O(groups))."""
        w = F.window(F.col(self.time_col), self.window)
        aggs = [F.count(F.lit(1)).alias("rc")]
        for c in self.sum_cols:
            aggs += [
                F.sum(c).alias(f"s_{c}"),
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
            ]
        for c in self.hll_cols:
            aggs.append(F.hll_sketch_agg(F.col(c), F.lit(self.lgk)).alias(f"hll_{c}"))
        return (
            df.groupBy(w.alias("w"), *[F.col(d) for d in self.dims])
            .agg(*aggs)
            .withColumn("w_start", F.col("w.start"))
            .drop("w")
            .withColumn("pday", F.date_format("w_start", "yyyy-MM-dd"))
        )

    @staticmethod
    def _merge_aggs(sum_cols, hll_cols):
        aggs = [F.sum("rc").alias("rc")]
        for c in sum_cols:
            aggs += [
                F.sum(f"s_{c}").alias(f"s_{c}"),
                F.min(f"mn_{c}").alias(f"mn_{c}"),
                F.max(f"mx_{c}").alias(f"mx_{c}"),
            ]
        for c in hll_cols:
            aggs.append(F.hll_union_agg(F.col(f"hll_{c}")).alias(f"hll_{c}"))
        return aggs

    # ------------------------------------------------------------- absorb

    def has_batch(self, batch_id: str) -> bool:
        return self._fs.exists(f"data/batch={_sanitize_batch_id(batch_id)}")

    def absorb(self, df: DataFrame, batch_id: str) -> bool:
        """Fold one micro-batch into the store, exactly once.

        Returns True if absorbed, False if ``batch_id`` was already
        committed (replay after a crash PAST the commit rename — the
        no-op makes redelivery safe, unlike blind parquet appends which
        would double-count).  Commit protocol: write partials to
        ``_absorb_<uuid>``, then one atomic rename to
        ``data/batch=<id>`` — rename-fails-if-destination-exists doubles
        as the winner-takes-all race arbiter."""
        bid = _sanitize_batch_id(batch_id)
        if self.has_batch(bid):
            return False
        staging = f"{self.path}/_absorb_{uuid.uuid4().hex}"
        (
            self._partials(df)
            .repartition(F.col("pday"))  # one file per touched day
            .write.mode("overwrite")
            .partitionBy("pday")
            .parquet(staging)
        )
        jp, fs = self._fs._jpath, self._fs._fs
        dest = jp(f"{self.path}/data/batch={bid}")
        fs.mkdirs(jp(f"{self.path}/data"))
        if not fs.rename(jp(staging), dest):
            # lost a commit race (or a concurrent replay won): roll back
            fs.delete(jp(staging), True)
            if self.has_batch(bid):
                return False
            raise IOError(f"commit rename failed: {staging} -> {dest}")
        return True

    # ------------------------------------------------------------ queries

    def _read(self, start=None, end=None) -> DataFrame:
        """Partial-state rows in [start, end) — the pday partition filter
        prunes day DIRECTORIES at planning time, so a one-week query over
        a year of state reads ~7/365ths of it."""
        df = self.spark.read.parquet(f"{self.path}/data")
        if start is not None:
            df = df.where(
                (F.col("pday") >= F.date_format(F.lit(start), "yyyy-MM-dd"))
                & (F.col("w_start") >= F.lit(start))
            )
        if end is not None:
            df = df.where(
                (F.col("pday") <= F.date_format(F.lit(end), "yyyy-MM-dd"))
                & (F.col("w_start") < F.lit(end))
            )
        return df

    def snapshot(self, start=None, end=None, estimate_hll: bool = True) -> DataFrame:
        """Merged rollup: one row per (w_start, dims) with ``rc``,
        ``s_/mn_/mx_<c>``, and ``nd_<c>`` (approx distinct) columns.
        Cost is O(partials in range) — raw events are never re-read."""
        if not self._exists():
            raise ValueError(f"empty rollup store: {self.path}")
        merged = (
            self._read(start, end)
            .groupBy("w_start", *self.dims)
            .agg(*self._merge_aggs(self.sum_cols, self.hll_cols))
        )
        if estimate_hll:
            for c in self.hll_cols:
                merged = merged.withColumn(
                    f"nd_{c}", F.hll_sketch_estimate(F.col(f"hll_{c}"))
                ).drop(f"hll_{c}")
        return merged

    # ---------------------------------------------------------- retention

    def expire(self, before) -> int:
        """Drop all partials for windows strictly before ``before``
        (must be day-aligned, since retention is enforced at the pday
        directory level — sub-day expiry would need a rewrite, not a
        delete).  Cost is O(day directories dropped): a directory listing
        plus one recursive delete per expired day per batch generation —
        no data is read or rewritten, which is what makes retention
        viable on a store with years of history.  Returns the number of
        day-directories removed."""
        import datetime as _dt

        day = before.date() if isinstance(before, _dt.datetime) else before
        if isinstance(before, _dt.datetime) and (
            before.hour or before.minute or before.second or before.microsecond
        ):
            raise ValueError(f"expire() cutoff must be day-aligned, got {before}")
        cutoff = day.strftime("%Y-%m-%d")
        if not self._exists():
            return 0
        jp, fs = self._fs._jpath, self._fs._fs
        dropped = 0
        with self._fs.lock("expire"):
            for gen in fs.listStatus(jp(f"{self.path}/data")):
                if not gen.getPath().getName().startswith("batch="):
                    continue
                for dstat in fs.listStatus(gen.getPath()):
                    name = dstat.getPath().getName()
                    if name.startswith("pday=") and name[5:] < cutoff:
                        fs.delete(dstat.getPath(), True)
                        dropped += 1
        return dropped

    # ------------------------------------------------------------ compact

    def compact(self, files_per_day: int = 1) -> None:
        """Re-merge per-batch partials so state converges to O(groups):
        read all committed partials, merge-aggregate, rewrite as a single
        ``batch=compacted-*`` generation via the _StoreFS staging swap
        (crash at any point leaves or restores a complete ``data`` tree;
        see _StoreFS.recover).  Snapshots before and after are
        equivalent — count/sum/min/max merge losslessly and HLL union is
        associative, so even the sketch estimates are bit-identical."""
        with self._fs.lock("compact"):
            self._fs.recover("data")
            self._sweep_staging()
            if not self._exists():
                return
            gen = f"compacted-{uuid.uuid4().hex[:12]}"
            merged = (
                self.spark.read.parquet(f"{self.path}/data")
                .groupBy("pday", "w_start", *self.dims)
                .agg(*self._merge_aggs(self.sum_cols, self.hll_cols))
                .withColumn("batch", F.lit(gen))
                # (pday, salt) repartition → at most files_per_day files
                # per day dir; the salt splits a hot day across tasks
                .repartition(
                    F.col("pday"),
                    F.pmod(F.hash("w_start", *self.dims), F.lit(files_per_day)),
                )
                .sortWithinPartitions("pday", "w_start")
            )
            staged = f"{self.path}/_compact_data"
            merged.write.mode("overwrite").partitionBy("batch", "pday").parquet(
                staged
            )
            live = f"{self.path}/data"
            old = f"{self.path}/_old_data"
            self._fs._rename(live, old)
            self._fs._rename(staged, live)
            self._fs._fs.delete(self._fs._jpath(old), True)
