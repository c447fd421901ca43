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


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_val: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming AS-OF join (J6 in streaming form): for every left row,
    the latest right row with ``right_ts <= left_ts`` and equal key —
    Spark's built-in stream-stream joins can express range windows (J8)
    but not "latest prior", so this is a custom stateful operator.

    Emission protocol (event-time timeouts): a left row is emitted only
    once the watermark passes its timestamp — any still-missing right
    row at or before it would be dropped as late anyway, so the answer
    is final.  Pending left rows arm ``setTimeoutTimestamp`` so groups
    re-fire when the watermark matures them even if no new data arrives
    for that key.

    Bounded state (the 100 TB property): per key, the state holds only
    (a) left rows newer than the watermark, (b) right rows newer than
    the watermark, and (c) ONE right row — the latest below the
    watermark.  (c) is sufficient because every future emittable left
    row has ts >= watermark, so among below-watermark right rows only
    the latest can ever be the as-of answer.  State therefore scales
    with in-flight data inside the watermark horizon plus a steady-state
    floor of one compacted right row per key ever seen — the minimum a
    correct as-of can retain (a future left may still need the latest
    prior right); keys whose traffic stops re-fire once via timeout to
    compact down to that floor.

    Output: (key, left_id, left_ts, right_ts_asof, right_val_asof) —
    join back on (key, left_id) downstream for other left columns.
    ``right_val`` is surfaced as DOUBLE (cast upstream as needed).

    Deployment note: the union's watermark is the MIN of the two
    streams' watermarks (Spark's multipleWatermarkPolicy default), so
    an idle RIGHT stream holds back emission of matured left rows —
    exactly the conservative behavior you want for correctness, but it
    means both sources must keep producing (or carry heartbeats) for
    the join to drain.
    """
    from pyspark.sql import functions as F

    from .stream import ensure_event_time

    key_field = left.schema[key]
    # the state layout carries left ids as long; a string/UUID id column
    # would silently cast to NULL in every emitted row, so fail fast and
    # tell the caller to surrogate the id upstream instead
    id_type = left.schema[left_id].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"stream_asof_join: left_id column '{left_id}' has type "
            f"{id_type.simpleString()}, but the bounded-state layout "
            "requires an integral id (cast or derive a surrogate id, "
            "e.g. xxhash64, upstream and join back on it)"
        )
    out_schema = T.StructType(
        [
            T.StructField(key, key_field.dataType),
            T.StructField(left_id, T.LongType()),
            T.StructField(left_ts, T.TimestampType()),
            T.StructField("right_ts_asof", T.TimestampType()),
            T.StructField("right_val_asof", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("lids", T.ArrayType(T.LongType())),
            T.StructField("lts", T.ArrayType(T.LongType())),
            T.StructField("rts", T.ArrayType(T.LongType())),
            T.StructField("rvals", T.ArrayType(T.DoubleType())),
        ]
    )

    lt = (
        ensure_event_time(left, left_ts)
        .withWatermark(left_ts, watermark)
        .where(F.col(left_ts).isNotNull())
        .select(
            F.col(key).alias("_k"),
            F.lit(1).alias("_side"),
            F.col(left_id).cast("long").alias("_id"),
            F.col(left_ts).alias("_ts"),
            F.lit(None).cast("double").alias("_val"),
        )
    )
    rt = (
        ensure_event_time(right, right_ts)
        .withWatermark(right_ts, watermark)
        # null-value right rows are skipped ENTIRELY, matching the batch
        # asof_join's last(..., ignorenulls=True): the as-of answer falls
        # through to the previous non-null row, never to a NaN.  Null
        # timestamps are unordered on either side and are dropped too
        # (pandas would map NaT to INT64_MIN, i.e. "infinitely old").
        .where(F.col(right_val).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(key).alias("_k"),
            F.lit(0).alias("_side"),
            F.lit(None).cast("long").alias("_id"),
            F.col(right_ts).alias("_ts"),
            F.col(right_val).cast("double").alias("_val"),
        )
    )

    def _us(series: pd.Series) -> list[int]:
        s = series
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        return (s.astype("int64") // 1000).tolist()  # ns -> us

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        if state.exists:
            lids, lts, rts, rvals = (list(x) for x in state.get)
        else:
            lids, lts, rts, rvals = [], [], [], []
        for pdf in pdfs:
            if pdf.empty:
                continue
            lmask = pdf["_side"] == 1
            if lmask.any():
                lids.extend(int(x) for x in pdf.loc[lmask, "_id"])
                lts.extend(_us(pdf.loc[lmask, "_ts"]))
            rmask = ~lmask
            if rmask.any():
                rts.extend(_us(pdf.loc[rmask, "_ts"]))
                rvals.extend(float(x) for x in pdf.loc[rmask, "_val"])
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        # sort right rows once; each matured left row binary-searches its
        # latest-prior match — (L+R) log R instead of L*R linear scans,
        # which matters for hot keys with thousands of in-horizon rows
        import bisect

        order = sorted(range(len(rts)), key=lambda j: rts[j])
        rts_sorted = [rts[j] for j in order]
        rvals_sorted = [rvals[j] for j in order]

        emit_ids, emit_ts, emit_rts, emit_rvals = [], [], [], []
        keep_ids, keep_ts = [], []
        for i, t in zip(lids, lts):
            if t < wm_us:
                pos = bisect.bisect_right(rts_sorted, t) - 1
                emit_ids.append(i)
                emit_ts.append(t)
                emit_rts.append(rts_sorted[pos] if pos >= 0 else None)
                emit_rvals.append(rvals_sorted[pos] if pos >= 0 else None)
            else:
                keep_ids.append(i)
                keep_ts.append(t)

        # right compaction: in-horizon rows + the single latest matured one
        keep_r = [j for j, t in enumerate(rts) if t >= wm_us]
        matured = [j for j, t in enumerate(rts) if t < wm_us]
        if matured:
            keep_r.append(max(matured, key=lambda j: rts[j]))
        rts2 = [rts[j] for j in keep_r]
        rvals2 = [rvals[j] for j in keep_r]

        if keep_ids or rts2:
            state.update((keep_ids, keep_ts, rts2, rvals2))
            if keep_ids:
                # re-fire when the watermark matures the oldest pending
                # left row (ms; must be beyond the current watermark)
                state.setTimeoutTimestamp(max(min(keep_ts) // 1000 + 1, wm_ms + 1))
            elif len(rts2) > 1:
                # no pending lefts, but the right buffer still holds
                # in-horizon rows: without a timer this key would never
                # be invoked again if its traffic stops, freezing the
                # buffer at its last size forever.  Re-fire once the
                # horizon passes the newest right row, which compacts
                # the buffer to its single latest matured row — the
                # steady-state floor of ONE row per key (the minimum a
                # correct as-of can hold: a future left may still need
                # the latest prior right).
                state.setTimeoutTimestamp(max(max(rts2) // 1000 + 1, wm_ms + 1))
        elif state.exists:
            state.remove()

        if emit_ids:
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(emit_ids),
                    left_id: emit_ids,
                    left_ts: pd.to_datetime(emit_ts, unit="us"),
                    "right_ts_asof": pd.to_datetime(
                        [t if t is not None else pd.NaT for t in emit_rts],
                        unit="us",
                    ),
                    "right_val_asof": emit_rvals,
                }
            )

    return (
        lt.unionByName(rt)
        .groupBy("_k")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )
