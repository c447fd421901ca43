"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in ``fluent_plugin_sql_spark.plans`` — every
operator registers a Spark implementation and (when SQL-expressible) a
DuckDB oracle there.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

# importing the plan modules populates the registry
import fluent_plugin_sql_spark.plans.analytics  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.analytics2  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.functions_surface  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.llm_pipeline  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.reference_ops  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.sampling  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.scale_ops  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.temporal  # noqa: F401, E402
import fluent_plugin_sql_spark.plans.tpch_extra  # noqa: F401, E402
from fluent_plugin_sql_spark.plans.registry import oracle_map, query_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's own core operator: the incremental
    scan (S1) feeding the pricing-summary aggregate — ingest + analytics
    in one plan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from fluent_plugin_sql_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return oracle_map()
