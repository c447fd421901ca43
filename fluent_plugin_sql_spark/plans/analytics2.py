"""Analytics surface, part 2: subqueries, grouping sets, statistical
aggregates, HAVING, union-by-name, and the UDF/UDAF surface (§2.10).

The UDF entries intentionally route through Arrow-vectorized pandas UDFs
(`applyInPandas`) — demonstrating the engine's slow-path contract: Python
only at group granularity, Arrow batches, deterministic math that an SQL
oracle can replicate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, register_views
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate+join; expressed via SQL (same plan as the DataFrame
    formulation, clearer intent)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "uncorrelated_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      AND o_orderstatus = 'F'
    """,
)
def uncorrelated_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
          AND o_orderstatus = 'F'
        """
    )


@query(
    "having_filter",
    oracle="""
    SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY l_suppkey
    HAVING count(*) > 550 AND sum(l_quantity) > 13000
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .where((F.col("n") > 550) & (F.expr("qty") > 13000))
    )


@query(
    "grouping_sets_explicit",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 explicit GROUPING SETS with grouping() disambiguation flags
    (distinguishes a NULL group key from a rolled-up level)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               cast(grouping(o_orderstatus) AS int) AS g_status,
               cast(grouping(o_orderpriority) AS int) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@query(
    "stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance/corr/covar/regr."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_pq"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
    )


@query(
    "union_by_name_mixed_schemas",
    oracle="""
    SELECT id, kind, amount FROM (
      SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS amount
      FROM orders WHERE o_totalprice > 450000
      UNION ALL
      SELECT c_custkey AS id, 'customer' AS kind, NULL AS amount
      FROM customer WHERE c_acctbal > 9900
    )
    """,
)
def union_by_name_mixed_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 unionByName(allowMissingColumns=True): divergent-schema
    streams merged by column name — the multi-table event stream case
    the reference sidesteps by tagging per table (in_sql.rb:71)."""
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 450000)
        .select(
            F.col("o_orderkey").alias("id"),
            F.lit("order").alias("kind"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9900)
        .select(F.col("c_custkey").alias("id"), F.lit("customer").alias("kind"))
    )
    return o.unionByName(c, allowMissingColumns=True)


@query(
    "pandas_udaf_zscore",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def pandas_udaf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 UDF surface: per-group z-score via ``applyInPandas`` —
    Arrow-batched grouped-map pandas UDF (the engine's sanctioned slow
    path).  The oracle replicates the math with window functions, proving
    the UDF boundary preserves semantics exactly (pandas ddof=1 ==
    stddev_samp)."""
    e = _t(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "zscore": ((pdf["value"] - mean) / sd).round(6)}
        )

    return e.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        zscore, "event_id long, zscore double"
    )


@query(
    "pandas_udf_scalar_discount",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * 1.0825 AS taxed_price
    FROM lineitem WHERE l_quantity > 45
    """,
)
def pandas_udf_scalar_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 scalar pandas UDF (Arrow-vectorized elementwise math).
    No decimal rounding on either side: the 2-decimal price × 2-decimal
    discount grid lands exactly on half-cent boundaries where pandas
    (half-even) and SQL round() (half-away) disagree — raw IEEE products
    are bit-identical instead.  Exists to pin the UDF contract — the engine's guidance is to prefer
    built-ins (see every other query); when Python is unavoidable this is
    the shape it takes: numpy ops over Arrow batches, never per-row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def taxed(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount) * 1.0825

    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_linenumber",
        taxed("l_extendedprice", "l_discount").alias("taxed_price"),
    )


@query(
    "incremental_scan_by_time",
    oracle="""
    SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY ts ASC, event_id ASC LIMIT 1000
    """,
)
def incremental_scan_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 variant: timestamp update_column (the reference's usual
    configuration — ``updated_at`` tailing, README.md:83-99), with the
    unique key as deterministic tiebreak."""
    e = _t(spark, sf_dir, "events")
    return (
        e.where(F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp"))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(1000)
    )


@query(
    "conditional_agg_case",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (l_discount > 0.05) AS n_discounted,
           round(sum(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END), 2)
             AS taxed_revenue,
           round(avg(CASE WHEN l_quantity < 10 THEN l_extendedprice END), 4)
             AS small_order_avg
    FROM lineitem GROUP BY l_returnflag
    """,
)
def conditional_agg_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0)), 2
        ).alias("taxed_revenue"),
        F.round(
            F.avg(F.when(F.col("l_quantity") < 10, F.col("l_extendedprice"))), 4
        ).alias("small_order_avg"),
    )


@query(
    "udtf_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(toks[i * 10 + 1 : i * 10 + 10], ' ') AS chunk_text
    FROM t, LATERAL (
      SELECT unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS i
    ) g
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 UDTF: a Python user-defined TABLE function fans each document
    out into fixed 10-token chunks via LATERAL join — the one UDF shape
    (one row → many rows with custom logic) that scalar/grouped pandas
    UDFs can't express.  UDTFs evaluate row-at-a-time in Python, so this
    is a declared boundary for genuinely custom fan-out, never a bulk
    path — bulk chunking stays in codegen (see pack_sequences)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="chunk_idx int, chunk_text string")
    class ChunkDoc:
        def eval(self, text: str, n: int):  # noqa: ANN001
            if text is None:  # NULL text → no chunks, never a task kill
                return
            toks = text.split(" ")
            for i in range(0, len(toks), n):
                yield i // n, " ".join(toks[i : i + n])

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM _docs_udtf d, LATERAL chunk_doc(d.text, 10) c
        WHERE d.doc_id < 20
        """
    )


@query(
    "incremental_scan_ns",
    oracle="""
    SELECT event_id, epoch_ns(ts) AS ts_ns, event_type
    FROM events WHERE epoch_ns(ts) > 1705708800000000000
    ORDER BY ts_ns ASC, event_id ASC LIMIT 1000
    """,
)
def incremental_scan_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 at NANOSECOND watermark precision (fluentd EventTime is ns —
    reference ChangeLog:21 — which Spark's µs TimestampType cannot
    carry).  ``load_table(keep_ns=True)`` exposes the exact int64
    ``ts_ns`` and the standard :class:`IncrementalScan` runs on it
    unchanged: the strict ``>`` predicate, the ASC+LIMIT batch and the
    JSON checkpoint are all exact on int64, so two rows in the same
    microsecond but different nanoseconds resume correctly (proved with
    a synthesized TIMESTAMP(NANOS) file in tests/test_ns_time.py —
    driver parquet is µs-physical, where ``ts_ns = micros*1000``).

    Scale note: same pushed range-scan shape as ``incremental_scan`` —
    the ns long is a codegen projection, the filter pushes to the scan.
    """
    from ..io import load_table as _lt
    from ..sources.incremental import IncrementalScan

    scan = IncrementalScan(
        lambda: _lt(spark, sf_dir, "events", keep_ns=True),
        update_column="ts_ns",
        select_limit=1000,
        tiebreak_column="event_id",
    )
    # 2024-01-20 00:00:00 UTC as exact nanoseconds
    return scan.batch_plan(1705708800000000000).select(
        "event_id", "ts_ns", "event_type"
    )
