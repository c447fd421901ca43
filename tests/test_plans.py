"""Physical-plan audits (SURVEY.md §4): these tests pin the SCALE
properties of the declared queries — pushdown, broadcast strategy, top-k
physical operator — not just their results.  A regression here means a
query still returns correct rows but would fall over at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.io import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.where(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in plan


def test_column_pruning_reaches_parquet(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    # ReadSchema must contain ONLY the projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_incremental_scan_is_takeordered_with_pushdown(spark):
    """S1's plan: predicate pushed to the scan, ORDER+LIMIT fused into
    TakeOrderedAndProject (top-k, no global sort)."""
    from fluent_plugin_sql_spark.sources.incremental import IncrementalScan

    scan = IncrementalScan(lambda: load_table(spark, SF, "events"), "event_id", 500)
    plan = plan_of(scan.batch_plan(3000))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,3000)" in plan


def test_q3_top10_avoids_global_sort(spark):
    from fluent_plugin_sql_spark.plans.analytics import q3_shipping_priority

    plan = plan_of(q3_shipping_priority(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_star_join_dimensions_are_broadcast(spark):
    """Only nation/region (constant-size at every SF) carry forced
    broadcast hints; supplier/customer joins are size-decided.  The
    static plan may shuffle them (estimates are conservative), but the
    AQE-final plan must broadcast every dimension join at this SF —
    and at 100× the same query falls back to shuffle joins instead of
    OOMing a forced build side."""
    from fluent_plugin_sql_spark.plans.analytics import q5_local_supplier_volume

    df = q5_local_supplier_volume(spark, SF)
    df.collect()  # run to completion so AQE finalizes the plan
    # executedPlan().toString() prints ONLY the final adaptive plan
    # (explainString also appends the pre-AQE "Initial Plan", which
    # legitimately contains the SortMergeJoin AQE then converts)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    plan = plan.split("Initial Plan")[0]
    assert "isFinalPlan=true" in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q1_aggregate_is_partial_then_final(spark):
    from fluent_plugin_sql_spark.plans.analytics import q1_pricing_summary

    plan = plan_of(q1_pricing_summary(spark, SF))
    # two HashAggregates (partial + final) around one exchange:
    # map-side combine is what keeps the shuffle tiny at scale
    assert plan.count("HashAggregate") >= 2


def test_interval_join_is_broadcast_nested_loop(spark):
    from fluent_plugin_sql_spark.plans.temporal import interval_join_maintenance

    plan = plan_of(interval_join_maintenance(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan


def test_routing_is_single_pass_case(spark):
    """O3: the router computes one CASE column — no per-route rescans of
    the source in the plan."""
    from fluent_plugin_sql_spark.config import SinkRoute, SQLOutputConfig
    from fluent_plugin_sql_spark.sinks.router import SQLOutput

    df = load_table(spark, SF, "events").withColumn(
        "tag", F.concat(F.lit("db."), F.col("event_type"))
    )
    cfg = SQLOutputConfig(
        routes=[SinkRoute(table="a", pattern="db.click"), SinkRoute(table="dflt")]
    )
    routed = SQLOutput(cfg, lambda d, t: None).prepare(df)
    plan = plan_of(routed)
    assert plan.count("Location: InMemoryFileIndex") == 1  # ONE source scan
    assert "CASE WHEN" in plan


def test_whole_stage_codegen_covers_text_stats(spark):
    """Text analytics must stay JVM-side: no BatchEvalPython (row-at-a-
    time Python) anywhere in the plan."""
    from fluent_plugin_sql_spark.plans.llm_pipeline import text_stats

    plan = plan_of(text_stats(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # scan+decode stay codegen'd; the HOF
    # projection itself is interpreted (Spark limitation), still JVM-side


def test_pandas_udf_uses_arrow_not_batch_eval(spark):
    from fluent_plugin_sql_spark.plans.analytics2 import pandas_udf_scalar_discount

    plan = plan_of(pandas_udf_scalar_discount(spark, SF))
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_bloom_filter_prunes_fact_fact_join(spark):
    """Runtime bloom-filter join pruning (q18/q21 fact-fact shape): the
    selective orders side builds a bloom filter that prunes lineitem's
    scan BEFORE the shuffle.  Thresholds are lowered here because the
    test tables are tiny; at 100 TB the session defaults engage it on
    exactly this plan shape."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").where(F.col("o_totalprice") > 400000)
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "might_contain" in plan  # filter applied on the big side
        assert "bloom_filter_agg" in plan  # built from the selective side
        j.collect()  # and the pruned plan actually runs
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
