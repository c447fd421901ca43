"""Sampling, splitting, and profiling operators for training-data
pipelines.

Sampling here is HASH-BASED (content-addressed), not RNG-based: split
membership is a pure function of the stable key, so it is reproducible
across engines, runs, partitionings, and — critically for 100 TB
pipelines — across incremental re-runs: a document keeps its split
assignment when the corpus grows (RNG-based `sample()` reshuffles
everything on every change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_long
from ..io import load_table
from .registry import query


def hash_bucket(col, buckets: int = 100):
    """Stable [0, buckets) assignment from the portable md5 hash."""
    return md5_long(F.col(col).cast("string")) % buckets


def train_test_split(
    df: DataFrame, key_col: str, test_pct: int = 10, buckets: int = 100
) -> DataFrame:
    """Deterministic split: bucket = md5(key) % buckets; test iff
    bucket < test_pct.  Adding documents never moves existing ones."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key_col, buckets) < test_pct, "test").otherwise("train"),
    )


@query(
    "deterministic_train_test_split",
    oracle="""
    SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 100 < 10
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
    ) GROUP BY split
    """,
)
def deterministic_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed 90/10 split over documents; oracle re-derives the
    identical assignment from the portable hash."""
    d = load_table(spark, sf_dir, "documents")
    return (
        train_test_split(d, "doc_id", test_pct=10)
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "stratified_hash_sample",
    oracle="""
    SELECT event_type, count(*) AS n_sampled
    FROM events
    WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
          % 100 < CASE event_type WHEN 'error' THEN 50 ELSE 5 END
    GROUP BY event_type
    """,
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (oversample rare
    'error' events 10×) — deterministic hash gate instead of `sampleBy`'s
    RNG, so the sample is stable under re-runs and engine changes."""
    e = load_table(spark, sf_dir, "events")
    rate = F.when(F.col("event_type") == "error", 50).otherwise(5)
    return (
        e.where(hash_bucket("event_id", 100) < rate)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
    )


@query(
    "table_profile",
    oracle="""
    SELECT
      count(*) AS n_rows,
      count(DISTINCT o_custkey) AS n_customers,
      sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS null_prices,
      round(min(o_totalprice), 2) AS min_price,
      round(max(o_totalprice), 2) AS max_price,
      round(avg(o_totalprice), 4) AS avg_price,
      min(o_orderdate) AS first_order,
      max(o_orderdate) AS last_order,
      count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile (null counts, ranges, cardinalities)
    — the pipeline pre-flight check before a 100 TB run."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "null_prices"
        ),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "value_histogram",
    oracle="""
    SELECT CASE WHEN value < 0 THEN 0
                WHEN value >= 200 THEN 21
                ELSE CAST(floor(value / 10) AS BIGINT) + 1 END AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — single-pass distribution
    profile (partial-aggregated, shuffle carries ≤22 rows/partition)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.width_bucket("value", F.lit(0.0), F.lit(200.0), F.lit(20)).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@query(
    "reservoir_sample_per_source",
    oracle="""
    SELECT source, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR))
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size k=20 sample per source — the deterministic analogue of
    per-group reservoir sampling (Vitter's Algorithm R): every document
    is ranked by the portable md5 of its key and the first k win, which
    is a uniform draw over any corpus in which doc_id is unrelated to
    content order, yet reproducible across runs, engines, and corpus
    growth (an RNG reservoir re-draws on every pass).

    Scale shape: ``row_number() <= k`` compiles to WindowGroupLimit —
    each map task keeps only k rows per group BEFORE the shuffle, so the
    exchange carries O(groups * k * partitions) rows, not the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .drop("rn")
    )


@query(
    "weighted_sample_documents",
    # Efraimidis-Spirakis A-ES with the portable md5 hash as the uniform
    # draw: key = ln(u)/w, take the top-k keys.  Deterministic, so the
    # oracle recomputes the identical sample; inclusion probability is
    # proportional to weight (w_i / sum w) in the k << n regime.
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                 % 1000003 + 0.5) / 1000003.0) / n_chars AS k
      FROM documents
    )
    SELECT doc_id, n_chars, round(k, 9) AS sample_key
    FROM s ORDER BY k DESC, doc_id LIMIT 50
    """,
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, deterministically
    (Efraimidis-Spirakis A-ES): each doc draws u from its own portable
    hash and scores ln(u)/weight; the k largest scores are the sample,
    with inclusion probability proportional to weight (here n_chars —
    longer docs sampled more often, the usual token-budget-aware
    pretraining mix move).

    Hash-derived u makes the "random" sample a pure function of content
    ids: reproducible across engines (the oracle recomputes it), runs,
    and incremental re-runs — and the plan is one map + one
    TakeOrderedAndProject, no shuffle of the corpus and no RNG state.
    """
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(1_000_003)) + 0.5
    ) / 1_000_003.0
    # try_divide: a 0-length doc has zero weight — NULL key sorts last
    # (never sampled) instead of DIVIDE_BY_ZERO killing the job
    k = F.try_divide(F.log(u), F.col("n_chars"))
    return (
        d.select("doc_id", "n_chars", k.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "n_chars", F.round("k", 9).alias("sample_key"))
    )
