"""Scale-pattern operators: skew-salted aggregation and CDC/upsert merge.

These are the patterns that keep plans healthy at 100 TB:
- ``salted_agg``: two-phase aggregation through an explicit salt for
  skewed group keys — phase 1 shuffles on (key, salt) spreading a hot key
  over N reducers, phase 2 combines the N partials per key.  AQE's skew
  handling covers *join* skew; aggregation skew on a few giant keys still
  benefits from explicit salting.
- ``merge_upsert``: MERGE-INTO emulation (no Delta/Iceberg jars in this
  environment): anti-join the base against update keys + union the
  updates.  This is the CDC apply step for the incremental ingest path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: Callable[[], list[Column]],
    partial_aggs: Callable[[], list[Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` builds the phase-1 aggregate columns and ``aggs``
    builds the phase-2 combiners over them (sum→sum of sums, count→sum of
    counts, min→min of mins…).  The salt is derived from a stable hash of
    the full row spread via ``spark_partition_id`` + monotonic id — here
    we use a random-free deterministic spread: crc32 of the row's unique
    columns modulo buckets would need a unique col; simplest determinism
    is monotonically_increasing_id % buckets, which is partition-stable
    for a fixed input layout.
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs())
    return phase1.groupBy(*key_cols).agg(*aggs())


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE emulation: updates replace matching base rows, inserts pass
    through.  Two distributed ops: one anti join (base minus updated keys)
    + one union — no driver materialization.  With Delta/Iceberg on the
    classpath this becomes a real ``MERGE INTO`` (file-level rewrite);
    semantics here are identical."""
    survivors = base.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    return survivors.unionByName(updates.select(*base.columns))


def scd2_apply(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """SCD Type-2 apply: close out current versions of updated keys
    (set valid_to + clear the flag), append updates as new current rows.

    All set-logic — anti/semi joins + unions; no per-row state."""
    upd_keys = updates.select(*key_cols).distinct()
    untouched = base.join(upd_keys, key_cols, "left_anti")
    closed = (
        base.join(upd_keys, key_cols, "left_semi")
        .where(F.col(current_flag))
        .withColumn(end_col, F.current_timestamp())
        .withColumn(current_flag, F.lit(False))
    )
    still_old = base.join(upd_keys, key_cols, "left_semi").where(~F.col(current_flag))
    fresh = (
        updates.withColumn(end_col, F.lit(None).cast("timestamp"))
        .withColumn(current_flag, F.lit(True))
    )
    return untouched.unionByName(closed).unionByName(still_old).unionByName(
        fresh.select(*base.columns)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-salted equi-join for the case AQE can't fix: one (or few)
    join keys so hot that even a split shuffle partition is one task's
    whole runtime, and the small side is too large to broadcast outright.

    Pattern: the BIG side gets a random-free salt derived from a unique
    spread (xxhash64 of the whole row modulo buckets); the SMALL side is
    replicated ``salt_buckets``× (explode over the salt range), and the
    join key becomes (key, salt) — the hot key's rows now land on
    ``salt_buckets`` different reducers.  Cost: small side shuffles ×N;
    use only for genuinely pathological keys, and keep AQE's skew-join
    as the first resort.
    """
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    replicated_small = small.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt"),
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_big.join(replicated_small, [key, "_salt"]).drop("_salt")


def salted_session_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str,
    partial_aggs: Callable[[], list[Column]],
    merge_aggs: Callable[[], list[Column]],
    bucket_secs: int = 86_400,
) -> DataFrame:
    """Two-phase sessionization for skewed keys — the aggregation-side
    counterpart of :func:`salted_agg` for ``session_window``.

    Native ``groupBy(session_window(ts, gap), key)`` shuffles EVERY event
    of a key to one reducer to merge sessions; AQE's skew handling covers
    joins, not aggregations, so one pathological key (a bot account, a
    null-ish default id) serializes the whole stage at 100x scale.  Here
    phase 1 computes session windows within (key, coarse time bucket) —
    the hot key's events spread over ``n_days`` reducers — and phase 2
    merges only the per-bucket SESSION SUMMARIES (O(sessions), not
    O(events)) with an interval-merge window.

    Correctness: a phase-1 session's end is ``last_event_ts + gap``,
    so two partial sessions belong together iff the later one starts AT
    OR before the earlier one ends — Spark's own merge rule treats the
    boundary as inclusive (an event at exactly ``prev_end`` EXTENDS the
    session; verified against the native engine in
    tests/test_salted_session.py).  Bucket boundaries only ever split a
    chain, never re-order it: a session from bucket B can reach at most
    the first session of bucket B+1 (later ones sit > gap beyond it by
    construction), so the running-max interval merge reassembles every
    straddling session.  Proven ≡ native session_window by pytest and
    the oracle gate.

    ``partial_aggs``: phase-1 aggregates per partial session;
    ``merge_aggs``: phase-2 combiners over them (count→sum, sum→sum,
    min→min...).  ``bucket_secs`` must exceed the gap (default 1 day
    vs typical minutes-to-hours gaps); smaller buckets = more spread
    for hotter keys, at the cost of more phase-2 rows.
    """
    from pyspark.sql import Window

    g = (
        df.withColumn(
            "_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs)
        )
        .groupBy(key_col, "_bkt", F.session_window(ts_col, gap).alias("_w"))
        .agg(*partial_aggs())
    )
    agg_cols = [c for c in g.columns if c not in (key_col, "_bkt", "_w")]
    part = g.select(
        key_col,
        F.col("_w.start").alias("_start"),
        F.col("_w.end").alias("_end"),
        *agg_cols,
    )
    w = Window.partitionBy(key_col).orderBy("_start")
    prev_max_end = F.max("_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_s = (
        prev_max_end.isNull() | (F.col("_start") > prev_max_end)
    ).cast("long")
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        part.withColumn("_sid", sid)
        .groupBy(key_col, "_sid")
        .agg(
            F.min("_start").alias("session_start"),
            F.max("_end").alias("session_end"),
            *merge_aggs(),
        )
        .drop("_sid")
    )
