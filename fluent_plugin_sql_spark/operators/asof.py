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
    # batched withColumns: the per-column withColumn loops cost one py4j
    # round-trip AND one plan-wrapping Project each (~0.06 s of driver
    # wall per build on a wide events table); withColumns keeps the
    # exact replace-existing semantics in one hop
    lt = left.withColumns({"_side": F.lit(1), "_ts": F.col(left_ts)})
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumns({"_side": F.lit(0)})
    # align schemas for the union
    fill_rt = {c: F.lit(None) for c in left.columns if c not in rt.columns}
    if fill_rt:
        rt = rt.withColumns(fill_rt)
    fill_lt = {c: F.lit(None) for c in rt.columns if c not in lt.columns}
    if fill_lt:
        lt = lt.withColumns(fill_lt)
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


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for a plan (no job triggered)."""
    return int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # noqa: SLF001
    )


def _broadcast_threshold_bytes(df: DataFrame) -> int:
    raw = str(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    for suffix, mult in units.items():
        if raw.endswith(suffix + "b") or raw.endswith(suffix):
            return int(float(raw.rstrip("b").rstrip(suffix))) * mult
    try:
        return int(raw.rstrip("b"))
    except ValueError:
        return 10 << 20


# auto-strategy probe memo: logical-plan semantic hash -> "is small".
# Poll loops re-build the same interval_join every trigger; without the
# memo each build pays a bounded count JOB when Catalyst's estimate is
# garbage (LocalRelation-backed plans).  Safe to cache per plan: the
# plans whose estimates are garbage are LocalRelations (immutable data),
# while file-backed plans re-read their (growing) file stats each build
# and never reach the probe.  Bounded FIFO so a long-lived driver that
# builds many distinct plans can't grow it without bound.
_PROBE_MEMO: dict[int, bool] = {}
_PROBE_MEMO_MAX = 256


def _probe_is_small(right: DataFrame, max_rows: int) -> bool:
    try:
        key = right._jdf.queryExecution().analyzed().semanticHash()  # noqa: SLF001
    except Exception:  # plan not hashable -> just probe
        key = None
    if key is not None and key in _PROBE_MEMO:
        return _PROBE_MEMO[key]
    small = right.limit(max_rows + 1).count() <= max_rows
    if key is not None:
        while len(_PROBE_MEMO) >= _PROBE_MEMO_MAX:
            _PROBE_MEMO.pop(next(iter(_PROBE_MEMO)))
        _PROBE_MEMO[key] = small
    return small


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
    strategy: str = "auto",
    bucket_width_seconds: int | None = None,
    size_hint_rows: int | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals with
    ``start <= ts < end`` (J7).

    Strategy (the 100 TB guard — an unconditional broadcast OOMs the
    moment the interval table outgrows executor memory):

    - ``broadcast``: nested-loop per row over few intervals.  Right for
      small interval tables (calendars, maintenance windows).
    - ``bucketize``: both sides keyed by ``floor(time / width)``; each
      interval is replicated once per bucket it covers, then a plain
      equi-join on the bucket with the exact range predicate kept in the
      join condition.  One shuffle on the bucket key, no broadcast, no
      pair explosion beyond the ~(interval span / width) replication.
      ``width`` defaults to the p75 interval length, which bounds the
      average replication factor at a small constant.
    - ``auto`` (default): broadcast iff Catalyst's size estimate for the
      interval side is under ``spark.sql.autoBroadcastJoinThreshold``.
      When the estimate is garbage-big the bounded row probe's verdict
      is MEMOIZED per logical plan (semantic hash), so a poll loop
      re-building the same join pays the probe job once, not per
      trigger; ``size_hint_rows`` — the caller's own row-count knowledge
      of the interval side — skips estimate and probe entirely.

    The bucketized path supports ``inner``/``left``/``left_semi``/
    ``left_anti`` (a left row has exactly one bucket, so unmatched left
    rows null-extend once).  ``right``/``full`` would duplicate unmatched
    interval replicas — those fall back to broadcast and raise if the
    interval side is too big to broadcast.
    """
    cond = (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col))
    bucketizable = how in ("inner", "left", "leftouter", "left_outer", "semi",
                           "left_semi", "leftsemi", "anti", "left_anti", "leftanti")
    if strategy == "auto":
        # Catalyst overestimates but essentially never underestimates, so a
        # small estimate is trusted outright; a big one is confirmed with a
        # bounded row probe (LocalRelations behind projections report a
        # garbage default estimate, and 1e6 intervals ≈ tens of MB is still
        # comfortably broadcastable).
        max_rows = 1_000_000
        threshold = _broadcast_threshold_bytes(right)
        if size_hint_rows is not None:
            # the hint replaces the estimate/probe, NOT the operator's
            # broadcast policy: threshold <= 0 means broadcasting was
            # explicitly disabled and the hint must not re-enable it
            small = threshold > 0 and size_hint_rows <= max_rows
        else:
            small = _estimated_bytes(right) <= threshold
            if not small and threshold > 0:
                small = _probe_is_small(right, max_rows)
        if not small and not bucketizable:
            raise ValueError(
                f"interval_join how={how!r} requires broadcasting the interval "
                "side, but it exceeds spark.sql.autoBroadcastJoinThreshold; "
                "pass strategy='broadcast' to force it"
            )
        strategy = "broadcast" if (small or not bucketizable) else "bucketize"
    if strategy == "broadcast":
        return left.join(F.broadcast(right), cond, how)
    if strategy != "bucketize":
        raise ValueError(f"unknown interval_join strategy {strategy!r}")
    if not bucketizable:
        raise ValueError(f"bucketized interval_join does not support how={how!r}")

    def to_num(c: str):
        dt = dict(right.dtypes).get(c) or dict(left.dtypes).get(c)
        if dt in ("timestamp", "timestamp_ntz", "date"):
            return F.unix_timestamp(F.col(c).cast("timestamp"))
        return F.col(c)

    width = bucket_width_seconds
    if width is None:
        # p75 interval length bounds AVERAGE replication at a small
        # constant; the max-length floor bounds WORST-CASE replication of
        # a single pathological interval (e.g. one year-long row among
        # minute-long ones) at ≤256 copies.
        row = right.select(
            F.percentile_approx(to_num(end_col) - to_num(start_col), 0.75).alias("w"),
            F.max(to_num(end_col) - to_num(start_col)).alias("mx"),
        ).first()
        width = max(int(row["w"] or 0), int((row["mx"] or 0) // 256), 1)

    sb = F.floor(to_num(start_col) / F.lit(width))
    eb = F.greatest(sb, F.floor(to_num(end_col) / F.lit(width)))
    rb = right.withColumn("_rb", F.explode(F.sequence(sb, eb)))
    lb = left.withColumn("_lb", F.floor(to_num(left_ts) / F.lit(width)))
    joined = lb.join(rb, (F.col("_lb") == F.col("_rb")) & cond, how)
    return joined.drop("_lb", "_rb")
