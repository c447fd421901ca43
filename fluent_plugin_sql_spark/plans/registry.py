"""Query registry — the engine's declared operator surface.

Every operator claimed done in SURVEY.md §2 registers here with a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible)
a DuckDB oracle SQL string.  ``__spark_entry__`` exposes this registry to
the driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle.

    The registered callable pins the session timezone to UTC and ANSI
    mode ON before building the plan: the DuckDB oracle computes in
    naive-UTC with strict SQL semantics, and the harness may invoke
    queries on a session NOT built by our factory — without the pins, a
    non-UTC session would shift every timestamp value and a non-ANSI
    session would change error-path semantics (see session.py for why
    ANSI-on is the engine's documented choice).
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.ansi.enabled", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        REGISTRY[name] = (wrapped, oracle)
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}
