"""As-of join edge semantics, multimodal plumbing, streaming smoke."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.io import load_table
from fluent_plugin_sql_spark.operators.asof import asof_join, interval_join
from fluent_plugin_sql_spark.operators.multimodal import (
    attach_binary,
    decode_images,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_matches_latest_prior_and_ties(self, spark):
        left = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), "L1"), (1, ts("2024-01-01 12:00:00"), "L2"),
             (2, ts("2024-01-01 09:00:00"), "L3")],
            ["k", "t", "lname"],
        )
        right = spark.createDataFrame(
            [(1, ts("2024-01-01 09:30:00"), "early"),
             (1, ts("2024-01-01 12:00:00"), "tie"),     # equal ts -> matches (<=)
             (1, ts("2024-01-01 13:00:00"), "future"),  # never matched
             (2, ts("2024-01-01 10:00:00"), "late")],   # after L3 -> no match
            ["k", "t", "rname"],
        )
        out = {r["lname"]: r["rname_asof"] for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", right_cols=["rname"]
        ).collect()}
        assert out == {"L1": "early", "L2": "tie", "L3": None}

    def test_interval_join_half_open(self, spark):
        events = spark.createDataFrame(
            [(1, ts("2024-01-01 00:00:00")), (2, ts("2024-01-01 01:00:00"))], ["id", "t"]
        )
        iv = spark.createDataFrame(
            [("w", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"))],
            ["w", "s", "e"],
        )
        got = interval_join(events, iv, "t", "s", "e").select("id").collect()
        assert [r["id"] for r in got] == [1]  # start inclusive, end exclusive


class TestMultimodal:
    def test_attach_binary_metadata(self, spark):
        d = attach_binary(load_table(spark, SF, "documents").limit(5), "text")
        row = d.select("media_meta.*", F.octet_length("payload").alias("n")).first()
        assert row["media_type"] == "image"
        assert row["n_bytes"] == row["n"] > 0
        assert len(row["checksum_md5"]) == 32

    def test_decode_stub_strict_raises(self, spark):
        d = attach_binary(load_table(spark, SF, "documents").limit(2), "text")
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            decode_images(d, strict=True).collect()

    def test_decode_fake_is_deterministic_and_batched(self, spark):
        d = attach_binary(load_table(spark, SF, "documents").limit(20), "text")
        out1 = {r["doc_id"]: (r["width"], r["height"], r["channels"], r["n_pixels"])
                for r in decode_images(d).collect()}
        out2 = {r["doc_id"]: (r["width"], r["height"], r["channels"], r["n_pixels"])
                for r in decode_images(d.repartition(7)).collect()}
        assert out1 == out2  # partitioning must not change results
        for w, h, c, n in out1.values():
            assert 16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4 and n == w * h * c

    def test_sample_frames_bounded(self, spark):
        d = attach_binary(load_table(spark, SF, "documents").limit(10), "text")
        frames = sample_frames(d, max_frames=4)
        per_doc = frames.groupBy("doc_id").count().collect()
        assert all(1 <= r["count"] <= 4 for r in per_doc)


class TestStreaming:
    def test_windowed_stream_matches_batch(self, spark, tmp_path):
        from fluent_plugin_sql_spark.streaming import (
            stream_from_parquet_dir,
            windowed_stream,
        )

        events = load_table(spark, SF, "events")
        src = str(tmp_path / "src")
        events.limit(500).coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = stream_from_parquet_dir(spark, src, schema, max_files_per_trigger=1)
        q = (
            windowed_stream(stream, keys=["event_type"])
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
        # the same aggregation expression run in batch mode must agree
        batch = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in windowed_stream(
                spark.read.parquet(src), keys=["event_type"]
            ).collect()
        }
        assert got == batch and len(got) > 0

    def test_stream_routed_to_sql_output(self, spark, tmp_path):
        from fluent_plugin_sql_spark.config import SinkRoute, SQLOutputConfig
        from fluent_plugin_sql_spark.sinks import SQLOutput
        from fluent_plugin_sql_spark.streaming import (
            stream_from_parquet_dir,
            stream_to_sql_output,
        )

        events = load_table(spark, SF, "events").limit(100)
        src = str(tmp_path / "src2")
        events.withColumn(
            "tag", F.concat(F.lit("db."), F.col("event_type"))
        ).coalesce(1).write.parquet(src)
        schema = spark.read.parquet(src).schema

        written = {}

        def write(df, table):
            written.setdefault(table, 0)
            written[table] += df.count()

        out = SQLOutput(
            SQLOutputConfig(
                routes=[
                    SinkRoute(table="clicks", pattern="click"),
                    SinkRoute(table="other"),
                ],
                remove_tag_prefix="db",
            ),
            write,
        )
        q = stream_to_sql_output(
            stream_from_parquet_dir(spark, src, schema),
            out,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        total = sum(written.values())
        assert total == 100 and written.get("clicks", 0) > 0
