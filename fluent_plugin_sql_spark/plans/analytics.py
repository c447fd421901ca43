"""Analytics surface (SURVEY.md §2.3-§2.8): joins, aggregations, windows,
sort/top-k, set ops — all expressed as declarative DataFrame/SQL plans so
Catalyst owns the physical strategy.

Scale design notes (audited via .explain, see tests/test_plans.py):
- Small dims (region/nation/supplier) are broadcast — no shuffle for the
  dimension side of star joins; AQE upgrades the rest at runtime.
- Aggregations are partial+final hash aggregates (map-side combine) by
  construction; no distinct-driven expansions except where declared.
- Top-K = orderBy+limit → TakeOrderedAndProject, never a full global sort.
- Floating aggregates are rounded in BOTH engines: double addition is
  order-sensitive, so unrounded sums are not reproducible at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- A1: group-by
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-wide hash aggregate.  Partial aggregation
    (map-side combine) makes the shuffle carry ≤ |groups|×partitions rows —
    at 100 TB the shuffle is KBs, not TBs."""
    # One SQL string = one py4j hop: the Column-tree build of this agg
    # cost ~336 py4j round-trips (~0.1-0.3 s of driver wall per build —
    # the reference's poll loop pays it every tick).  Parsed JVM-side
    # into the identical logical plan; rows/schema verified identical
    # against the Column form at sf0.01 and sf0.1.
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum((l_extendedprice * (1 - l_discount)) * (1 + l_tax)), 2)
                 AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM {li}
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        li=_t(spark, sf_dir, "lineitem"),
    )


# ------------------------------------------------------------- J1/J2 + top-k
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-K.
    customer and orders both scale linearly with SF, so NO forced
    broadcast hints: AQE converts either join to broadcast when the
    built side is actually small (as it is at test SF) and falls back
    to shuffle joins on the keys at 100× — a forced broadcast of the
    date-filtered orders (~95% retained) would OOM the build side at
    scale.  The final ORDER+LIMIT is TakeOrderedAndProject (no global
    sort).  Tie-broken on l_orderkey so the LIMIT is deterministic."""
    # single-hop SQL build (see q1_pricing_summary); per-table filters
    # live in WHERE — the optimizer pushes them below the joins exactly
    # as the previous per-DataFrame .where() chain did
    return spark.sql(
        """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM {li} JOIN ({o} JOIN {c} ON o_custkey = c_custkey)
             ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
        """,
        li=_t(spark, sf_dir, "lineitem"),
        o=_t(spark, sf_dir, "orders"),
        c=_t(spark, sf_dir, "customer"),
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join.  Forced broadcasts ONLY on the
    true constant-size dimensions (nation=25, region=5 rows at every SF);
    supplier and customer scale linearly with SF, so their joins carry no
    hint — AQE broadcasts them while they are small and shuffle-joins on
    the keys at 100×, where a forced broadcast would OOM the build side."""
    # single-hop SQL build (see q1_pricing_summary); the BROADCAST hints
    # bind to the n/r aliases — same forced broadcasts as the previous
    # F.broadcast() calls, still none on the SF-scaling tables
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
               n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM {li} li
        JOIN {o} o  ON li.l_orderkey = o.o_orderkey
        JOIN ({s} s JOIN {n} n ON s.s_nationkey = n.n_nationkey
                    JOIN {r} r ON n.n_regionkey = r.r_regionkey)
             ON li.l_suppkey = s.s_suppkey
        JOIN {c} c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        """,
        li=_t(spark, sf_dir, "lineitem"),
        o=_t(spark, sf_dir, "orders"),
        s=_t(spark, sf_dir, "supplier"),
        n=_t(spark, sf_dir, "nation"),
        r=_t(spark, sf_dir, "region"),
        c=_t(spark, sf_dir, "customer"),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — every predicate pushes to the parquet
    scan (PushedFilters), zero shuffle beyond the final 1-row reduce."""
    # single-hop SQL build (see q1_pricing_summary)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM {li}
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
        li=_t(spark, sf_dir, "lineitem"),
    )


# ------------------------------------------------------------------ windows
@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (§2.5): top-K per group — one shuffle on the
    partition key, rank computed within partitions (no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window aggregate over a rows frame (§2.5)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "order_gaps_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def order_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead (§2.5)."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


# ------------------------------------------------------- A2/A4/A5/A6: aggs
@query(
    "distinct_aggs",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct aggregate (expand+two-phase under the hood)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: rollup grouping sets."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@query(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: exact interpolated percentiles (Spark `percentile` ≙ DuckDB
    `quantile_cont`).  At 100 TB prefer `percentile_approx` (sketch-based,
    single pass) — exposed as `percentiles_approx` with a rows-only check
    since sketches differ across engines."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        )
    )


@query(
    "percentiles_approx",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           TRUE AS approx_in_rank_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 scale path: GK-sketch percentile, single pass, mergeable.

    Sketch values differ across engines, so the raw estimate can't be
    hash-compared — instead the query RETURNS THE SKETCH'S ERROR
    CONTRACT: `percentile_approx(.., accuracy=10000)` guarantees rank
    error <= 1/accuracy = 1e-4, so the returned element must lie between
    the exact 0.48 and 0.52 quantiles (a 200x margin).  The boolean is
    deterministic given the data; the oracle asserts TRUE, so a sketch
    regression that drifts out of its published bound hash-fails the
    gate rather than hiding behind a rows-only check.  `p50_exact` keeps
    a real value comparison in the hash as well."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_p50a"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "p50_exact"
            ),
            F.expr("percentile(l_extendedprice, 0.48)").alias("_lo"),
            F.expr("percentile(l_extendedprice, 0.52)").alias("_hi"),
        )
        .select(
            "l_returnflag",
            "p50_exact",
            (F.col("_p50a").between(F.col("_lo"), F.col("_hi"))).alias(
                "approx_in_rank_bounds"
            ),
        )
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: HyperLogLog++ approximate distinct — the 100 TB path for
    cardinality (constant memory, mergeable across partitions).

    HLL registers differ across engines, so like `percentiles_approx`
    the query returns the ESTIMATOR'S ERROR CONTRACT instead of the raw
    estimate: at rsd=0.01 the relative error's standard deviation is 1%,
    so a 5% tolerance is a ~5-sigma bound — deterministic in practice
    (the hash functions are fixed), and a drift past it means the
    estimator is broken, which should hash-fail.  `exact_parts` keeps a
    real value comparison in the hash."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                # try_divide: an all-NULL key group has exact_parts = 0
                F.try_divide(
                    F.abs(F.col("_approx") - F.col("exact_parts")),
                    F.col("exact_parts"),
                )
                <= F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "collect_sorted_sets",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def collect_sorted_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: collect_set — sorted+joined so the result is deterministic
    (raw collect order is partition-dependent, never comparable)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
                "priorities"
            )
        )
    )


# ----------------------------------------------------------- J4/J5: join kinds
@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'O')
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 semi join — EXISTS without duplication."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'P')
    """,
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 anti join — NOT EXISTS (customers with no pending orders)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "outer_join_order_counts",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 930.0), ('mid', 930.0, 970.0),
             ('premium', 970.0, 1e12)
    )
    SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J7 non-equi (interval) join.  The band table is tiny → broadcast
    nested loop, which is the right physical plan: each row tests 3
    intervals, no shuffle."""
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 1e12)],
        ["band", "lo", "hi"],
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
    )


# ----------------------------------------------------------------- set ops
@query(
    "set_ops_customer_nations",
    oracle="""
    SELECT n FROM (
      (SELECT DISTINCT c_nationkey AS n FROM customer
       INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      UNION
      (SELECT DISTINCT c_nationkey FROM customer
       EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    )
    """,
)
def set_ops_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: intersect / except / union(distinct)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n")).distinct()
    return c.intersect(s).union(c.exceptAll(s.distinct()).distinct()).distinct()


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 0), 2) AS "O",
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 0), 2) AS "F",
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 0), 2) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit values keep the plan a
    single pass; inferring values would need an extra distinct scan)."""
    piv = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .sum("o_totalprice")
    )
    return piv.select(
        "o_orderpriority",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ["O", "F", "P"]],
    )


# ------------------------------------------------------------ scalar surface
@query(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS pri_upper,
           substr(o_orderstatus, 1, 1) AS status_1,
           length(o_orderpriority) AS pri_len,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           CAST(round(o_totalprice / 100.0, 0) AS BIGINT) AS price_hundreds,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-F scalar library parity: string/date/math/conditional built-ins."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_1"),
        F.length("o_orderpriority").alias("pri_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        # try_cast: a NaN price overflows an ANSI bigint cast
        F.round(F.col("o_totalprice") / 100.0, 0)
        .try_cast("long")
        .alias("price_hundreds"),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_class"),
    )


@query(
    "json_extraction",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-F json: schema-free props column → typed value at query time
    (SURVEY.md §1.3: props is a JSON string, from_json/get_json_object)."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
