"""Declared queries for the scale-pattern operators (skew salting, CDC
merge) — oracles prove the rewrites are semantics-preserving: the salted
two-phase aggregation and the anti-join+union MERGE must produce exactly
what the naive formulation produces."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.scale import merge_upsert, salted_agg
from .registry import query


@query(
    "salted_skew_aggregation",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
           round(min(value), 2) AS vmin, round(max(value), 2) AS vmax
    FROM events GROUP BY event_type
    """,
)
def salted_skew_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 5-key (maximally skewed) group
    column.  The oracle is the NAIVE group-by — identical results prove
    the salt+combine rewrite is transparent.  At scale: phase 1 spreads
    each hot key over 16 reducers; phase 2 combines 16 partials per key."""
    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e.select("event_type", "value"),
        key_cols=["event_type"],
        partial_aggs=lambda: [
            F.count("*").alias("_n"),
            F.sum("value").alias("_s"),
            F.min("value").alias("_mn"),
            F.max("value").alias("_mx"),
        ],
        aggs=lambda: [
            F.sum("_n").alias("n"),
            F.round(F.sum("_s"), 2).alias("total"),
            F.round(F.min("_mn"), 2).alias("vmin"),
            F.round(F.max("_mx"), 2).alias("vmax"),
        ],
        salt_buckets=16,
    )
    return out


@query(
    "merge_upsert_customers",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(c_acctbal + 1000, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    UNION ALL
    SELECT * FROM updates
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE emulation (anti-join + union): apply a +1000 balance
    update to every 100th customer.  The oracle re-derives MERGE semantics
    in set algebra — proving upsert correctness without a lakehouse
    format (with Delta/Iceberg jars this call becomes MERGE INTO)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment",
    )
    updates = (
        c.where(F.col("c_custkey") % 100 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 1000, 2))
    )
    return merge_upsert(c, updates, ["c_custkey"])


@query(
    "scd2_current_rows",
    oracle="""
    SELECT user_id, event_type, round(value, 2) AS value
    FROM (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def scd2_current_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance as a declared query: the events
    change-log is split at 60% of the id range into an existing dimension
    (latest state per user, open-ended current rows) and an update batch
    (latest change per user after the split); :func:`scd2_apply` closes
    out superseded versions and appends the new current rows.  The oracle
    is the windowed latest-per-key over the WHOLE log — identical current
    rows prove the close-out/append set-logic is equivalent to recomputing
    from scratch.  At scale the apply is 3 key-shuffles over the (small)
    update keys + unions; no per-row state, no full-dimension rewrite.

    Scan discipline: ``scd2_apply`` references its base 3× and updates 2×
    (untouched/closed/still-old + key set), which would naively re-scan
    the change log 6× (first cut of this query did — PLANS.md showed
    scans=6).  Both latest-per-(user, half) frames come out of ONE window
    pass here, materialized once (tiny: ≤2 rows/user) via eager
    localCheckpoint, so the log is scanned once for the split boundary
    and once for the window — independent of how many times the apply
    references its inputs."""
    from pyspark.sql import Window

    from ..operators.scale import scd2_apply

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    split = e.agg((F.max("event_id") * 0.6).cast("long").alias("_split"))
    w = Window.partitionBy("user_id", "_half").orderBy(F.desc("event_id"))
    latest_both = (
        e.crossJoin(F.broadcast(split))
        .withColumn(
            "_half",
            F.when(F.col("event_id") <= F.col("_split"), 0).otherwise(1),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "_half", "user_id", "event_type", "value",
            F.col("ts").alias("valid_from"),
        )
        .localCheckpoint(eager=True)
    )
    base = (
        latest_both.where(F.col("_half") == 0)
        .drop("_half")
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    updates = latest_both.where(F.col("_half") == 1).drop("_half")
    dim = scd2_apply(base, updates, ["user_id"], ts_col="valid_from")
    return dim.where(F.col("is_current")).select(
        "user_id", "event_type", F.round("value", 2).alias("value")
    )


@query(
    "salted_join_user_activity",
    oracle="""
    WITH dim AS (SELECT user_id, count(*) AS user_n FROM events GROUP BY user_id)
    SELECT e.event_type, count(*) AS n, CAST(sum(d.user_n) AS BIGINT) AS weight
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.event_type
    """,
)
def salted_join_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join as a declared query: events (big, hot keys)
    x a per-user dimension through :func:`salted_join` — the big side is
    salted by a full-row hash, the dimension replicated 8x, and the join
    key becomes (user_id, salt) so one hot user spreads over 8 reducers.
    The oracle is the PLAIN unsalted join — identical aggregates prove
    the salting is semantics-transparent (exact integer sums, so any
    dropped or duplicated row would flip the hash)."""
    from ..operators.scale import salted_join

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    dim = e.groupBy("user_id").agg(F.count("*").alias("user_n"))
    joined = salted_join(e, dim, "user_id", salt_buckets=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("user_n").alias("weight")
    )


@query(
    "zorder_clustered_scan",
    # The z-order rewrite is a LAYOUT change only — a filtered aggregate
    # over the clustered copy must equal the same over the raw relation.
    # (The multi-column file-skipping the layout buys is asserted from
    # parquet footer stats in tests/test_lake_scale.py.)
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(value) AS total_value
    FROM events
    WHERE user_id < 8 AND value BETWEEN 20 AND 120
    GROUP BY event_type
    """,
)
def zorder_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering (sinks/lake.write_zordered): events
    rewritten range-sorted by the interleaved (user_id, value) key, then
    queried with a two-column predicate.  At 100 TB the clustered layout
    prunes files/row-groups on EITHER column via parquet min-max stats —
    Delta OPTIMIZE ZORDER BY, from stock DataFrame ops (one range
    shuffle + in-partition sort)."""
    import shutil
    import tempfile

    from ..sinks.lake import write_zordered

    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="zorder_gate_")
    try:
        write_zordered(
            ev.select("event_id", "user_id", "event_type", "value"),
            f"{path}/z",
            ["user_id", "value"],
            num_files=16,
            bits_per_col=6,
        )
        out = (
            spark.read.parquet(f"{path}/z")
            .where((F.col("user_id") < 8) & F.col("value").between(20, 120))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total_value"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "session_windows_salted",
    oracle="""
    WITH m AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '4 hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '4 hours' AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_windows_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof sessionization: the two-phase
    :func:`salted_session_window` rewrite of the `session_windows` gate
    query, sharing its ORACLE — phase 1 sessionizes within (user, day)
    so a hot user's events spread over as many reducers as days, phase 2
    interval-merges only the per-day session summaries.  Identical
    results to the native single-shuffle `session_window` prove the
    rewrite semantics-transparent; it is the plan to reach for when one
    key dominates the event stream at 100x scale."""
    from ..operators.scale import salted_session_window

    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return salted_session_window(
        e,
        "user_id",
        "ts",
        "4 hours",
        partial_aggs=lambda: [F.count("*").alias("_n")],
        merge_aggs=lambda: [F.sum("_n").alias("n_events")],
    ).select("user_id", "session_start", "session_end", "n_events")
