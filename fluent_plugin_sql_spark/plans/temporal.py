"""Temporal operators: event-time windows, sessionization, as-of joins
(SURVEY.md §2.9 G-T, §2.3 J6/J7) over the `events` stream table.

These run identically in batch and Structured Streaming —
``window()`` / ``session_window()`` are the same expressions the
streaming wrappers (streaming/) use with watermarks; declaring them here
in batch mode lets the DuckDB oracle prove the time semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.time import safe_date_trunc
from ..io import load_table
from ..operators.asof import asof_join, interval_join
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-T tumbling window aggregate — identical expression works under
    readStream+watermark (streaming mode tested in tests/test_streaming.py)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "sliding_window_counts",
    oracle="""
    WITH buckets AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
             AS window_start,
             event_type, value
      FROM events
    )
    SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
           event_type, count(*) AS n
    FROM buckets GROUP BY 1, 2, 3
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-T sliding window (1 h window, 30 min slide): each event lands in
    exactly 2 windows."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


@query(
    "session_windows",
    oracle="""
    WITH m AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '4 hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '4 hours' AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-T sessionization: 4-hour inactivity gap.  ``session_window`` is
    the same expression Structured Streaming uses with a watermark; the
    oracle re-derives the merge semantics via lag/cumsum."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "4 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS click_ts_asof, c.event_id AS click_id_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 as-of join: each purchase matched to the user's latest prior (or
    simultaneous) click.  Union+window implementation — one shuffle, no
    pair explosion (oracle: DuckDB's native ASOF JOIN)."""
    e = _events(spark, sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("event_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "event_id"],
        suffix="_x",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_x").alias("click_ts_asof"),
        F.col("event_id_x").alias("click_id_asof"),
    )


@query(
    "interval_join_maintenance",
    oracle="""
    WITH windows(wname, wstart, wend) AS (
      VALUES ('w1', TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-07 00:00:00'),
             ('w2', TIMESTAMP '2024-01-15 12:00:00', TIMESTAMP '2024-01-16 00:00:00'),
             ('w3', TIMESTAMP '2024-01-25 00:00:00', TIMESTAMP '2024-01-26 06:00:00')
    )
    SELECT wname, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events JOIN windows ON ts >= wstart AND ts < wend
    GROUP BY wname
    """,
)
def interval_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 point-in-interval join against a small broadcast interval table."""
    e = _events(spark, sf_dir)
    windows = spark.createDataFrame(
        [
            ("w1", "2024-01-05 00:00:00", "2024-01-07 00:00:00"),
            ("w2", "2024-01-15 12:00:00", "2024-01-16 00:00:00"),
            ("w3", "2024-01-25 00:00:00", "2024-01-26 06:00:00"),
        ],
        ["wname", "wstart", "wend"],
    ).select(
        "wname",
        F.col("wstart").cast("timestamp"),
        F.col("wend").cast("timestamp"),
    )
    return (
        interval_join(e, windows, "ts", "wstart", "wend")
        .groupBy("wname")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "funnel_click_to_purchase",
    oracle="""
    SELECT p.user_id,
           count(DISTINCT p.event_id) AS n_conversions,
           min(p.ts) AS first_conversion_ts
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts > p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.user_id
    ORDER BY p.user_id
    """,
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step analysis: purchases preceded by a click from the same
    user within 1 hour.  Shape: both sides pre-filter to their step (the
    filters reach the parquet scan), then one equi-join on user_id with a
    range residual — a plain shuffle-hash/sort-merge join on the key, no
    time-bucket explosion, and AQE handles hot users via skew split."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    c = ev.where(F.col("event_type") == "click").alias("c")
    joined = p.join(
        c,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
    )
    return (
        joined.groupBy(F.col("p.user_id").alias("user_id"))
        .agg(
            F.countDistinct("p.event_id").alias("n_conversions"),
            F.min("p.ts").alias("first_conversion_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "ewma_user_value",
    oracle="""
    SELECT user_id,
           round(list_reduce(
             list(value ORDER BY ts, event_id),
             (acc, x) -> 0.2 * x + 0.8 * acc
           ), 6) AS ewma
    FROM events
    GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of `value` — an
    ORDER-SENSITIVE sequential fold, the family of per-key recurrences
    (EWMA/session scoring/decayed counts) that SQL aggregates can't
    express directly.

    Skew-safe CHUNKED fold: a single per-user ``collect_list`` puts one
    hot user's entire history into one aggregation buffer (unbounded in
    events-per-key).  Instead the series is segmented by TIME (weekly
    chunks), each chunk folded independently to a 4-scalar summary
    (len, zero-seeded partial, first value), then chunk summaries combine
    in time order with the exponential decay identity

        ewma(a ++ b) = decay^|b| * ewma(a) + partial(b)
        ewma(first chunk a) = partial(a) + decay^|a| * first(a)

    so the largest buffer is bounded by events-per-key-per-WEEK (a rate,
    not a history), and the per-user state is one small struct per chunk.
    The identity holds because the null-seeded fold
    ``acc = 0.2x + 0.8·acc`` is linear in acc: partial(a) with a 0.0 seed
    differs from ewma(a) only by the first element's weight
    (0.8^{|a|-1} vs 0.2·0.8^{|a|-1}), i.e. by ``0.8^{|a|}·first(a)``."""
    ev = load_table(spark, sf_dir, "events")
    decay = 0.8
    chunked = ev.withColumn(
        "_chunk", F.floor(F.unix_timestamp("ts") / F.lit(7 * 86400))
    )
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    partial = F.aggregate(
        F.transform(arr, lambda x: x["value"]),
        F.lit(0.0),
        lambda acc, x: 0.2 * x + decay * acc,
    )
    summaries = chunked.groupBy("user_id", "_chunk").agg(
        F.size(arr).alias("m"),
        partial.alias("s"),
        arr[0]["value"].alias("first_v"),
    )
    chunks = F.array_sort(F.collect_list(F.struct("_chunk", "m", "s", "first_v")))
    fold = F.aggregate(
        chunks,
        F.lit(None).cast("double"),
        lambda acc, c: F.when(
            acc.isNull(), c["s"] + F.pow(F.lit(decay), c["m"]) * c["first_v"]
        ).otherwise(F.pow(F.lit(decay), c["m"]) * acc + c["s"]),
    )
    return summaries.groupBy("user_id").agg(F.round(fold, 6).alias("ewma"))


@query(
    "rollup_store_incremental",
    # The oracle aggregates the RAW relation in one shot; the Spark side
    # answers from MERGED PARTIALS absorbed in three batches — equality
    # proves the algebraic-partial contract (count/sum add, min/max
    # re-extremize) end-to-end through the store's commit protocol.
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           count(*) AS rc,
           sum(value) AS s_value,
           min(value) AS mn_value,
           max(value) AS mx_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_store_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate (operators/rollup.RollupStore):
    events absorbed in three micro-batches (``event_id % 3``), answered
    from merged partials — the materialized-rollup pattern the reference's
    poll loop (in_sql.rb:136-161) forces downstream consumers to rebuild
    from raw rows every interval.  absorb cost is O(batch), snapshot cost
    is O(partials); raw history is never re-read."""
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_gate_")
    try:
        store = RollupStore(
            spark, f"{path}/s", "ts", "1 hour",
            dims=("event_type",), sum_cols=("value",),
        )
        for b in (0, 1, 2):
            store.absorb(ev.where(F.col("event_id") % 3 == b), f"b{b}")
        store.compact()
        out = store.snapshot().select(
            "w_start", "event_type", "rc", "s_value", "mn_value", "mx_value"
        )
        # pin before the scratch store is deleted (same contract as the
        # dedup-store gates)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "rollup_store_time_range",
    # Exercises the pday partition-pruned snapshot path: only day
    # directories 2024-01-10..2024-01-16 are read (plan-asserted in
    # tests/test_llm_ops.py::test_rollup_snapshot_prunes_day_partitions).
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           count(*) AS rc,
           sum(value) AS s_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-17 00:00:00'
    GROUP BY 1
    """,
)
def rollup_store_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ranged rollup query: the snapshot's [start, end) filter prunes
    day directories at planning time, so a one-week dashboard query over a
    year of rollup state reads ~7/365ths of it — the access pattern
    continuous aggregates exist for."""
    import datetime
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_range_gate_")
    try:
        store = RollupStore(spark, f"{path}/s", "ts", "1 hour", sum_cols=("value",))
        for b in (0, 1):
            store.absorb(ev.where(F.col("event_id") % 2 == b), f"b{b}")
        out = store.snapshot(
            start=datetime.datetime(2024, 1, 10),
            end=datetime.datetime(2024, 1, 17),
        ).select("w_start", "rc", "s_value")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "rollup_store_regroup",
    # The oracle aggregates raw events at DAILY grain with no dims; the
    # Spark side answers from an HOURLY, per-event-type partial store
    # via regroup('1 day', dims=()) — equality proves partials re-merge
    # correctly across BOTH axes (window coarsening and dim collapse),
    # the query-rewrite path continuous aggregates exist for.
    oracle="""
    SELECT date_trunc('day', ts)::TIMESTAMP AS w_start,
           count(*) AS rc,
           sum(value) AS s_value,
           min(value) AS mn_value,
           max(value) AS mx_value
    FROM events
    GROUP BY 1
    """,
)
def rollup_store_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarser-query answering from stored partials
    (operators/rollup.RollupStore.regroup): an hourly x event_type store
    answers a daily, all-types question by re-merging partials — counts
    and sums add, extrema re-extremize — without ever re-reading raw
    events.  This is the materialized-view rewrite a TimescaleDB-style
    continuous aggregate performs; cost O(partials), not O(history)."""
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_regroup_gate_")
    try:
        store = RollupStore(
            spark, f"{path}/s", "ts", "1 hour",
            dims=("event_type",), sum_cols=("value",),
        )
        for b in (0, 1):
            store.absorb(ev.where(F.col("event_id") % 2 == b), f"b{b}")
        out = store.regroup(window="1 day", dims=()).select(
            "w_start", "rc", "s_value", "mn_value", "mx_value"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "rollup_store_approx_users",
    # HLL sketches (Datasketches, lgk=12) stay in exact coupon mode well
    # past these per-group cardinalities (max 51 distinct users per
    # hour x type at sf0.1; the sparse-mode exactness bound is an order
    # of magnitude higher), so the estimate is INTEGER-EXACT here and
    # hash-comparable to the oracle's exact COUNT(DISTINCT) — verified at
    # sf0.01 and sf0.1.  DAY windows at sf0.1 (~500 distinct/group) cross
    # the sparse->dense transition and drift by ±1-2 — the expected HLL
    # behavior, which is why this gate pins the window to 1 hour.  At
    # production cardinalities the estimate departs (±2.2% stderr); the
    # merge/union path being exercised is identical either way.
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           count(DISTINCT user_id) AS nd_user_id
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_store_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-distinct rollup: per-batch HLL sketch partials unioned at
    query time (``hll_sketch_agg`` absorb-side / ``hll_union_agg``
    merge-side) — the mergeable-sketch contract that makes distinct counts
    maintainable incrementally at 100 TB, where exact per-window distinct
    over raw history is a full re-shuffle per refresh."""
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_hll_gate_")
    try:
        store = RollupStore(
            spark, f"{path}/s", "ts", "1 hour",
            dims=("event_type",), hll_cols=("user_id",),
        )
        for b in (0, 1, 2):
            store.absorb(ev.where(F.col("event_id") % 3 == b), f"b{b}")
        store.compact()  # unions sketches — estimate must be unchanged
        out = store.snapshot().select("w_start", "event_type", "nd_user_id")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "rollup_store_retention",
    # Retention is directory-granular: expiring before 2024-01-15 must
    # leave EXACTLY the windows the row-level filter keeps (windows are
    # hour-aligned, cutoff day-aligned, so the two coincide).
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           count(*) AS rc,
           sum(value) AS s_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY 1
    """,
)
def rollup_store_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup retention path: absorb in two batches, ``expire()`` day
    directories before 2024-01-15 (O(dropped dirs) deletes — no reads or
    rewrites), snapshot what remains.  The production shape for bounded
    rollup state over unbounded streams."""
    import datetime
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_ret_gate_")
    try:
        store = RollupStore(spark, f"{path}/s", "ts", "1 hour", sum_cols=("value",))
        for b in (0, 1):
            store.absorb(ev.where(F.col("event_id") % 2 == b), f"b{b}")
        store.expire(datetime.datetime(2024, 1, 15))
        out = store.snapshot().select("w_start", "rc", "s_value")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "rollup_store_histogram",
    # The merged histogram arrays are EXACT (integer bin counts merged by
    # element-wise addition), so exploding them to (window, type, bin,
    # cnt) rows hash-compares against binning the raw relation directly.
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           CASE WHEN value < 0 THEN 0
                WHEN value >= 400 THEN 81
                ELSE CAST(floor(value / 5) AS INT) + 1 END AS bin,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def rollup_store_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile partials (RollupStore hist_cols): per-batch
    fixed-bin histograms merged by exact element-wise addition — the
    incremental percentile machinery Spark's approx_percentile cannot
    provide (its state is not re-mergeable across separate
    aggregations).  The gate compares the merged arrays bin-for-bin
    against direct SQL binning of the raw relation."""
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_hist_gate_")
    try:
        store = RollupStore(
            spark, f"{path}/s", "ts", "1 hour",
            dims=("event_type",), hist_cols={"value": (0.0, 400.0, 80)},
        )
        for b in (0, 1, 2):
            store.absorb(ev.where(F.col("event_id") % 3 == b), f"b{b}")
        store.compact()
        out = (
            store.snapshot()
            .select(
                "w_start",
                "event_type",
                F.posexplode("hg_value").alias("bin", "cnt"),
            )
            .where(F.col("cnt") > 0)
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cohort_retention",
    # Week arithmetic as integer day-diffs / 7 (both engines truncate
    # weeks to Monday, so the difference is always a multiple of 7) —
    # no engine-specific week-diff function involved.
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS wk
      FROM events
    )
    SELECT f.cohort,
           (datediff('day', f.cohort, a.wk) / 7)::BIGINT AS week_offset,
           count(DISTINCT f.user_id) AS n_users
    FROM first f JOIN act a USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in every later week they were active — the standard
    retention-triangle input.  Shape at scale: first-seen is one keyed
    min per user; activity weeks are a distinct projection; the join is
    user-keyed (AQE-skew-splittable); the final count collapses to
    O(cohorts x offsets) rows.  Raw events stream through exactly two
    keyed shuffles — no windows, no self-join on events."""
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        safe_date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", safe_date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        first.join(act, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "robust_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT d.event_id, d.event_type, d.value,
           round(d.med, 6) AS med, round(m.mad, 6) AS mad
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.adev > 3 * m.mad
    """,
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose value deviates from their
    type's median by more than 3x the median absolute deviation — the
    standard data-quality screen that, unlike z-scores, is not itself
    corrupted by the outliers it hunts.  Shape: two keyed exact
    percentiles over a low-cardinality group (event_type), each result
    broadcast back onto the stream — events shuffle only for the two
    percentile aggregations, and at 100 TB both collapse to
    approx_percentile with the same plan."""
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_id", "event_type", "value", "med",
            F.abs(F.col("value") - F.col("med")).alias("adev"),
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("adev") > 3 * F.col("mad"))
        .select(
            "event_id", "event_type", "value",
            F.round("med", 6).alias("med"), F.round("mad", 6).alias("mad"),
        )
    )


@query(
    "rollup_store_top_values",
    # At gate cardinality (4 event types << the 8k=24 candidate budget)
    # the candidate-map merge is EXACT, so the store's top-3 must equal
    # the direct per-hour top-3 with the same deterministic ordering
    # (count desc, value asc) — the same exact-at-small-cardinality
    # construction as the HLL gate.
    oracle="""
    WITH c AS (
      SELECT date_trunc('hour', ts) AS w_start, event_type,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT w_start, event_type, cnt,
             row_number() OVER (PARTITION BY w_start
                                ORDER BY cnt DESC, event_type) AS rank
      FROM c
    )
    SELECT w_start, rank::INT AS rank, event_type AS val, cnt
    FROM r WHERE rank <= 3
    """,
)
def rollup_store_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable top-k value tracking through the rollup store
    (top_cols): per-batch candidate maps (top 8k values per group)
    merged at query time by key-union map sum — the heavy-hitters
    partial a streaming timeseries DB exposes as topN.  Events absorbed
    in three batches, compacted mid-way, answered from partials; the
    direct SQL oracle proves the candidate merge loses nothing at this
    cardinality."""
    import shutil
    import tempfile

    from ..operators.rollup import RollupStore

    ev = _events(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="rollup_topv_gate_")
    try:
        store = RollupStore(
            spark, f"{path}/s", "ts", "1 hour", top_cols={"event_type": 3},
        )
        for b in (0, 1, 2):
            store.absorb(ev.where(F.col("event_id") % 3 == b), f"b{b}")
            if b == 1:
                store.compact()  # candidate maps must survive compaction
        out = (
            store.regroup()
            .select("w_start", F.explode("top_event_type").alias("t"))
            .select(
                "w_start",
                F.col("t._rn").alias("rank"),
                F.col("t._val").alias("val"),
                F.col("t._cnt").alias("cnt"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
