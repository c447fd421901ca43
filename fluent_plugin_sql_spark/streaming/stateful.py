"""Custom stateful streaming operators (SURVEY.md §2.9 G-T, §2.10).

``applyInPandasWithState`` is the engine's escape hatch for semantics
that windowed aggregation can't express — here, a running per-key
accumulator with custom emission logic (emit a row only when the
accumulated value crosses a threshold — e.g. spend-alert streams).

State is a bounded tuple per key; timeouts reclaim idle keys, which is
what keeps state size O(active keys), not O(events), at stream scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("alerted", T.BooleanType()),
    ]
)


def threshold_alerts(
    df: DataFrame,
    threshold: float = 1000.0,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Emit one alert row per key the first time its running total crosses
    ``threshold``.  Not expressible as a windowed agg (emission depends on
    path-dependent state), hence the stateful pandas operator."""

    def fn(
        key_tuple: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,  # GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            total, n, alerted = state.get
        else:
            total, n, alerted = 0.0, 0, False
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        newly_crossed = not alerted and total >= threshold
        state.update((total, n, alerted or newly_crossed))
        if newly_crossed:
            yield pd.DataFrame(
                {"user_id": [key_tuple[0]], "total_value": [total], "n_events": [n]}
            )

    return df.groupBy(key).applyInPandasWithState(
        fn, ALERT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout"
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """J8: watermarked stream-stream inner join — right rows join left
    rows within ``max_lag`` after them.  Both watermarks bound the join
    state buffer; without the time-range predicate the state would grow
    unboundedly."""
    from pyspark.sql import functions as F

    from .stream import ensure_event_time

    lt = ensure_event_time(left, left_ts).withWatermark(left_ts, left_watermark).alias("l")
    rt = ensure_event_time(right, right_ts).withWatermark(right_ts, right_watermark).alias("r")
    return lt.join(
        rt,
        F.expr(
            f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts} "
            f"AND r.{right_ts} <= l.{left_ts} + interval {max_lag}"
        ),
    )
