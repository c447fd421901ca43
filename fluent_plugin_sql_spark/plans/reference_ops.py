"""Reference-parity operators as declared queries (SURVEY.md §2.1-§2.2,
§2.6, §2.8).

Each query exercises one reference semantic on the driver tables, with a
DuckDB oracle proving the semantics.  These are the *exact-semantics* rows
of the operator inventory: the incremental scan shape, column_mapping,
tag routing, and the time scalar functions.

Scale notes: every plan here is a filter/project/top-K — Catalyst pushes
the predicate and the projection into the parquet scan, and ORDER+LIMIT
becomes TakeOrderedAndProject (no full sort).  On JDBC sources the same
plan composes into the generated SQL (sources/jdbc.incremental_query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SinkRoute
from ..io import load_table
from ..sinks.router import route_expr
from ..sources.incremental import IncrementalScan
from .registry import query


@query(
    "incremental_scan",
    oracle="""
    SELECT * FROM events WHERE event_id > 3000
    ORDER BY event_id ASC LIMIT 500
    """,
)
def incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1/O1/O2: the reference's core poll query (README.md:34,
    in_sql.rb:129-159) — strict ``>`` watermark, ASC order, LIMIT."""
    scan = IncrementalScan(
        lambda: load_table(spark, sf_dir, "events"), "event_id", select_limit=500
    )
    return scan.batch_plan(last_value=3000)


@query(
    "column_mapping",
    oracle="""
    SELECT event_id AS id, user_id, value AS v FROM events
    """,
)
def column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: 'event_id:id,user_id,value:v' — rename+project, unmapped fields
    dropped (out_sql.rb:64-72, 140-148)."""
    from ..config import parse_column_mapping
    from ..sinks.router import apply_column_mapping

    df = load_table(spark, sf_dir, "events")
    return apply_column_mapping(df, parse_column_mapping("event_id:id,user_id,value:v"))


@query(
    "tag_routing",
    oracle="""
    SELECT event_id, 'db.' || event_type AS tag,
           CASE WHEN regexp_matches('db.' || event_type, '^db\\.click$') THEN 'clicks'
                WHEN regexp_matches('db.' || event_type, '^db\\.(signup|purchase)$') THEN 'conversions'
                ELSE 'event_log' END AS route_table
    FROM events
    """,
)
def tag_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/F4/F6: tag construction + fluentd-glob first-match-wins routing
    (out_sql.rb:229-235; README.md:132-146) as ONE CASE pass."""
    df = load_table(spark, sf_dir, "events").withColumn(
        "tag", F.concat(F.lit("db."), F.col("event_type"))
    )
    routes = [
        SinkRoute(table="clicks", pattern="db.click"),
        SinkRoute(table="conversions", pattern="db.{signup,purchase}"),
    ]
    return df.select(
        "event_id", "tag", route_expr(routes, "event_log").alias("route_table")
    )


@query(
    "time_format",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str FROM events
    """,
)
def time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: the reference's Time→string serialization at µs precision
    (time_format '%Y-%m-%d %H:%M:%S.%6N', in_sql.rb:62, 91-92)."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


@query(
    "lenient_time_parse",
    oracle="""
    SELECT event_id,
           coalesce(try_cast(raw_ts AS TIMESTAMP), TIMESTAMP '2024-06-01 12:00:00') AS time,
           try_cast(raw_ts AS TIMESTAMP) IS NULL AS time_fallback
    FROM (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN NULL
                  WHEN event_id % 10 = 1 THEN 'garbage'
                  ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END AS raw_ts
      FROM events
    )
    """,
)
def lenient_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/T3: lenient event-time with now-fallback, never dropping rows
    (in_sql.rb:118-126).  "now" is pinned for determinism — the engine
    pins a logical now per batch (SQLInput(now=...)) for replayability."""
    from ..functions.time import lenient_to_timestamp, time_fallback_flag

    df = load_table(spark, sf_dir, "events").withColumn(
        "raw_ts",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("string"))
        .when(F.col("event_id") % 10 == 1, F.lit("garbage"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")),
    )
    return df.select(
        "event_id",
        lenient_to_timestamp("raw_ts", now="2024-06-01 12:00:00").alias("time"),
        time_fallback_flag("raw_ts").alias("time_fallback"),
    )


@query(
    "tag_prefix_strip",
    oracle="""
    SELECT event_id, regexp_replace('db.' || event_type, '^db\\.?', '') AS tag
    FROM events
    """,
)
def tag_prefix_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: anchored tag-prefix strip (out_sql.rb:253-259)."""
    from ..functions.tags import strip_tag_prefix

    df = load_table(spark, sf_dir, "events").withColumn(
        "full_tag", F.concat(F.lit("db."), F.col("event_type"))
    )
    return df.select("event_id", strip_tag_prefix("full_tag", "db").alias("tag"))


@query(
    "type_degradation",
    oracle="""
    SELECT event_id, CAST(event_id AS VARCHAR) AS event_id_str,
           CAST(user_id AS VARCHAR) AS user_id_str,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM events
    """,
)
def type_degradation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: the reference's to_s serialization degradation (in_sql.rb:93-94)
    for non-msgpack-native values — ints and times stringified.  (Float
    stringification is intentionally NOT part of the declared surface:
    repr formats differ across engines; the engine's strict mode keeps
    native types instead — SURVEY.md §1.3.)"""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.col("event_id").cast("string").alias("event_id_str"),
        F.col("user_id").cast("string").alias("user_id_str"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


@query(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log → current-state materialization (the canonical consumer
    of this engine's incremental feed): latest record per key via
    row_number()=1 with a deterministic event_id tie-break.  One shuffle
    on the key; Spark plans a partial top-1 per partition before the
    exchange (WindowGroupLimit), so the shuffle carries candidate heads,
    not the whole change-log — the upsert-compaction shape at any scale."""
    from pyspark.sql.window import Window

    df = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.select(
            "user_id", "event_id", "ts", "event_type", "value",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
