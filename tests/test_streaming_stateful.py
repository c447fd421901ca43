"""Stream-stream join (J8) and custom stateful operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_sql_spark.io import load_table
from fluent_plugin_sql_spark.streaming.stateful import (
    stream_stream_join,
    threshold_alerts,
)

SF = "/root/testdata/sf0.001"


def _as_stream(spark, df, tmp_path, name):
    src = str(tmp_path / name)
    df.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        src,
    )


def test_threshold_alerts_fire_once_per_key(spark, tmp_path):
    events = load_table(spark, SF, "events").select("user_id", "value")
    stream, src = _as_stream(spark, events, tmp_path, "alert_src")
    q = (
        threshold_alerts(stream, threshold=1000.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("alerts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    alerts = spark.sql("SELECT * FROM alerts").collect()
    assert len(alerts) > 0
    # at most one alert per user, each at/above the threshold
    users = [r["user_id"] for r in alerts]
    assert len(users) == len(set(users))
    assert all(r["total_value"] >= 1000.0 for r in alerts)
    # no user that stayed below the threshold ever alerts
    totals = {
        r["user_id"]: r["total"]
        for r in events.groupBy("user_id").agg(F.sum("value").alias("total")).collect()
    }
    for u, total in totals.items():
        if total < 1000.0:
            assert u not in users


def test_stream_stream_join_matches_batch_range_join(spark, tmp_path):
    e = load_table(spark, SF, "events")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    cs, _ = _as_stream(spark, clicks, tmp_path, "clicks_src")
    ps, _ = _as_stream(
        spark, purchases.withColumnRenamed("p_ts", "ts"), tmp_path, "purch_src"
    )
    joined = stream_stream_join(cs, ps, key="user_id", max_lag="30 minutes")
    q = (
        joined.select(F.col("l.user_id").alias("u"), "l.ts", F.col("r.ts").alias("p_ts"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["u"], r["ts"], r["p_ts"]) for r in spark.sql("SELECT * FROM ssj").collect()}
    expected = {
        (r["user_id"], r["ts"], r["p_ts"])
        for r in clicks.join(purchases, "user_id")
        .where(
            (F.col("p_ts") >= F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("interval 30 minutes"))
        )
        .collect()
    }
    assert got == expected and len(got) > 0


def test_near_dedup_stream_filters_across_batches(spark, tmp_path):
    """foreachBatch near-dedup: micro-batch 2's near-copy of a batch-1
    doc is dropped through the persisted signature store while novel
    docs pass."""
    from pyspark.sql import types as T

    from fluent_plugin_sql_spark.operators.dedup import MinHashDedupStore
    from fluent_plugin_sql_spark.streaming.stream import (
        near_dedup_stream,
        stream_from_parquet_dir,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    variant = base.replace("green", "dark")
    other = (
        "completely different content about spark shuffles partitions "
        "and broadcast joins at terabyte scale with adaptive execution"
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame([(1, base)], schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame([(2, variant), (3, other)], schema).coalesce(1).write.parquet(
        str(src / "f2")
    )

    store = MinHashDedupStore(spark, str(tmp_path / "store"), sig_match_frac=0.5)
    seen: list[tuple[int, int]] = []

    out_dir = str(tmp_path / "out")

    def sink(df, epoch_id):
        df.write.mode("append").parquet(out_dir)

    stream = stream_from_parquet_dir(
        spark, f"{src}/*/", schema, max_files_per_trigger=1
    )
    q = near_dedup_stream(
        stream, store, "text", "doc_id", sink, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {1, 3}  # 2 (near-copy of 1) was dropped


def test_stream_asof_join_matches_batch_asof(spark, tmp_path):
    """Streaming as-of (custom applyInPandasWithState operator) must
    agree with the batch union+window asof_join once the watermark has
    matured every left row.  Sentinel rows (a far-future key) advance
    the watermark; event-time timeouts then flush groups that receive
    no further data."""
    import pandas as pd  # noqa: F401

    from fluent_plugin_sql_spark.operators.asof import asof_join
    from fluent_plugin_sql_spark.streaming.stateful import stream_asof_join

    e = load_table(spark, SF, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    max_ts = e.agg(F.max("ts")).first()[0]

    lsrc = str(tmp_path / "asof_left")
    rsrc = str(tmp_path / "asof_right")
    purchases.coalesce(2).write.parquet(lsrc)
    clicks.coalesce(2).write.parquet(rsrc)
    ls = (
        spark.readStream.schema(spark.read.parquet(lsrc).schema)
        .option("maxFilesPerTrigger", 1).parquet(lsrc)
    )
    rs = (
        spark.readStream.schema(spark.read.parquet(rsrc).schema)
        .option("maxFilesPerTrigger", 1).parquet(rsrc)
    )
    joined = stream_asof_join(
        ls, rs, key="user_id", left_id="event_id",
        left_ts="ts", right_ts="ts", right_val="value",
        watermark="1 hour",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("sasof")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # sentinel batches on BOTH sources: the union's watermark is the
        # MIN of the two streams' watermarks, so advancing only one side
        # pins it (observed: the right stream's frozen watermark held
        # back the last in-horizon left rows forever).  First round
        # advances the watermark past every real row, second triggers
        # the event-time timeouts under the advanced watermark.
        import datetime

        for i, days in enumerate((2, 3)):
            sent_ts = max_ts + datetime.timedelta(days=days)
            spark.createDataFrame(
                [(9_000_000 + i, 999_999, sent_ts)], purchases.schema
            ).write.mode("append").parquet(lsrc)
            spark.createDataFrame(
                [(999_999, sent_ts, 0.0)], clicks.schema
            ).write.mode("append").parquet(rsrc)
            q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    got = {
        (r["event_id"], r["user_id"], r["ts"], r["right_ts_asof"],
         r["right_val_asof"])
        for r in spark.sql(
            "SELECT * FROM sasof WHERE user_id != 999999"
        ).collect()
    }
    expected = {
        (r["event_id"], r["user_id"], r["ts"], r["ts_asof"],
         r["value_asof"])
        for r in asof_join(
            purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
            right_cols=["ts", "value"],
        ).collect()
    }
    assert len(expected) > 0
    assert got == expected


def test_stream_asof_idle_key_state_compacts_to_floor(spark, tmp_path):
    """A key whose traffic stops must not freeze its right-row buffer:
    once the watermark passes everything, the event-time timeout
    re-fires and compacts state to the single-latest-row floor.  We
    observe it through the state-store operator metrics (numRowsTotal):
    5 buffered right rows for an idle key must shrink to O(1) per key
    after watermark-advancing sentinel batches."""
    import datetime

    from fluent_plugin_sql_spark.streaming.stateful import stream_asof_join

    t0 = datetime.datetime(2024, 7, 1)
    rights = [(7, t0 + datetime.timedelta(minutes=i), float(i)) for i in range(5)]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(100, 7, t0)], "event_id LONG, user_id LONG, ts TIMESTAMP"
    ).write.parquet(lsrc)
    spark.createDataFrame(
        rights, "user_id LONG, ts TIMESTAMP, value DOUBLE"
    ).write.parquet(rsrc)
    ls = (
        spark.readStream.schema(spark.read.parquet(lsrc).schema)
        .option("maxFilesPerTrigger", 1).parquet(lsrc)
    )
    rs = (
        spark.readStream.schema(spark.read.parquet(rsrc).schema)
        .option("maxFilesPerTrigger", 1).parquet(rsrc)
    )
    j = stream_asof_join(
        ls, rs, key="user_id", left_id="event_id", watermark="10 minutes"
    )
    q = (
        j.writeStream.outputMode("append").format("memory")
        .queryName("sasof_idle")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance BOTH watermarks far past key 7's data, twice (first
        # advances, second fires the armed timeouts), then once more so
        # the compaction pass itself commits
        for i, days in enumerate((1, 2, 3)):
            st = t0 + datetime.timedelta(days=days)
            spark.createDataFrame(
                [(200 + i, 999, st)], "event_id LONG, user_id LONG, ts TIMESTAMP"
            ).write.mode("append").parquet(lsrc)
            spark.createDataFrame(
                [(999, st, 0.0)], "user_id LONG, ts TIMESTAMP, value DOUBLE"
            ).write.mode("append").parquet(rsrc)
            q.processAllAvailable()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
        q.awaitTermination(30)
    # floor: one compacted row per key ever seen (7 and the sentinel
    # key), NOT the 5 buffered rights key 7 held when its traffic ended
    assert state_rows <= 2, state_rows
