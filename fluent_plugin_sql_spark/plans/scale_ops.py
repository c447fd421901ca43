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
