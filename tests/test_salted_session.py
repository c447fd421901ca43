"""salted_session_window (operators/scale.py) must be exactly
equivalent to native session_window — including sessions that straddle
phase-1 bucket boundaries and events landing exactly on a session's
half-open end."""

from __future__ import annotations

import datetime as dtm

from pyspark.sql import functions as F

from fluent_plugin_sql_spark.io import load_table
from fluent_plugin_sql_spark.operators.scale import salted_session_window


def _native(df, gap):
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def _salted(df, gap, bucket_secs):
    return salted_session_window(
        df,
        "user_id",
        "ts",
        gap,
        partial_aggs=lambda: [F.count("*").alias("_n")],
        merge_aggs=lambda: [F.sum("_n").alias("n_events")],
        bucket_secs=bucket_secs,
    ).select("user_id", "session_start", "session_end", "n_events")


def _rows(df):
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    )


def test_salted_matches_native_on_events(spark):
    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    assert _rows(_salted(e, "4 hours", 86_400)) == _rows(_native(e, "4 hours"))


def test_salted_matches_native_across_bucket_boundaries(spark):
    """Hot key with one long session chain crossing several tiny phase-1
    buckets (bucket_secs=60 << the chain length) — phase 2 must stitch
    every straddling partial back into one session.  Also pins the exact
    boundary semantics: the native engine MERGES an event arriving at
    exactly prev_end (gap seconds after the last event) into the running
    session — boundary-inclusive — and the rewrite must match."""
    t0 = dtm.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: events every 30s for 10 minutes -> ONE session spanning
    # ten 60s buckets
    rows += [(1, t0 + dtm.timedelta(seconds=30 * i)) for i in range(21)]
    # user 1 again after a 300s quiet gap (> gap of 90s) -> second session
    rows += [(1, t0 + dtm.timedelta(seconds=30 * 20 + 300 + 10 * i)) for i in range(3)]
    # user 2: two events exactly gap seconds apart -> ONE session
    # (the native engine merges at the inclusive boundary)
    rows += [(2, t0), (2, t0 + dtm.timedelta(seconds=90))]
    # user 3: single event
    rows += [(3, t0 + dtm.timedelta(seconds=42))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    got = _rows(_salted(df, "90 seconds", 60))
    want = _rows(_native(df, "90 seconds"))
    assert got == want
    # shape sanity, independent of the native engine
    by_user = {}
    for u, *_ in got:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user == {1: 2, 2: 1, 3: 1}
