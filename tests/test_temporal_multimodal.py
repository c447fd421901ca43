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

    @staticmethod
    def _bmp(w, h, bpp=24):
        import struct

        # minimal BITMAPINFOHEADER, no pixel data needed for header parse
        return (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
                + struct.pack("<IiiHH", 40, w, -h, 1, bpp) + b"\x00" * 24)

    @staticmethod
    def _png(w, h, color_type=6):
        import struct

        ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + ihdr + b"\x00" * 4)

    @staticmethod
    def _wav(channels=2, rate=16000, bits=16, n_samples=8000):
        import struct

        data = b"\x00" * (n_samples * channels * (bits // 8))
        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * bits // 8, channels * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_real_header_decode_strict(self, spark):
        """BMP/PPM/PNG headers decode FOR REAL (stdlib parsers) — strict
        mode no longer raises for these formats."""
        from fluent_plugin_sql_spark.operators.multimodal import parse_image_header

        rows = [
            (1, self._bmp(640, 480)),
            (2, self._png(32, 64, color_type=2)),
            (3, b"P6\n# cmt\n123 77\n255\n" + b"\x00" * 10),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in decode_images(df, strict=True).collect()}
        assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (640, 480, 3)
        assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (32, 64, 3)
        assert (out[3]["width"], out[3]["height"], out[3]["channels"]) == (123, 77, 3)
        assert parse_image_header(b"\xff\xd8\xff\xe0 jpeg") is None  # needs codec

    def test_real_wav_decode_strict(self, spark):
        from fluent_plugin_sql_spark.operators.multimodal import decode_audio

        df = spark.createDataFrame(
            [(7, self._wav(channels=2, rate=16000, bits=16, n_samples=8000))],
            "doc_id long, payload binary",
        )
        r = decode_audio(df, strict=True).first()
        assert (r["channels"], r["sample_rate_hz"], r["bits_per_sample"]) == (2, 16000, 16)
        assert r["n_samples"] == 8000 and abs(r["duration_s"] - 0.5) < 1e-9

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


class TestStreamingDedup:
    def test_dedup_stream_drops_redelivered_rows(self, spark, tmp_path):
        """At-least-once upstream redelivery → exactly-once downstream:
        the same rows arriving in a later micro-batch (inside the
        watermark) are dropped, and state stays watermark-bounded."""
        from fluent_plugin_sql_spark.streaming.stream import (
            dedup_stream,
            stream_from_parquet_dir,
        )

        events = load_table(spark, SF, "events").limit(200).select(
            "event_id", "ts", "value"
        )
        src = str(tmp_path / "src")
        # file 1 = the original batch; file 2 = a redelivery of half of it
        events.coalesce(1).write.parquet(src)
        events.limit(100).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        assert spark.read.parquet(src).count() == 300  # dupes present

        stream = stream_from_parquet_dir(spark, src, schema, max_files_per_trigger=1)
        q = (
            dedup_stream(stream, ["event_id"], ts_col="ts", watermark="365 days")
            .writeStream.format("memory")
            .queryName("dedup_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.sql("SELECT event_id FROM dedup_out").collect()
        assert len(out) == 200
        assert len({r["event_id"] for r in out}) == 200


class TestEwmaChunkedFold:
    """ewma_user_value must match the flat sequential fold while keeping
    every aggregation buffer bounded by events-per-week, not per-user
    history — verified with one user owning ~50% of all events."""

    def test_skewed_user_matches_sequential_fold(self, spark, tmp_path):
        import random

        from fluent_plugin_sql_spark.plans.temporal import ewma_user_value

        rng = random.Random(7)
        base = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for i in range(600):  # hot user: ~50% of events over ~29 weeks
            rows.append(
                (eid, base + dt.timedelta(hours=i * 8), 1, rng.randrange(1000) / 10.0)
            )
            eid += 1
        for u in range(2, 14):
            for i in range(50):
                rows.append(
                    (eid, base + dt.timedelta(hours=i * 37), u, rng.randrange(1000) / 10.0)
                )
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

        out = {
            r["user_id"]: r["ewma"]
            for r in ewma_user_value(spark, str(tmp_path)).collect()
        }

        series = {}
        for e, t, u, v in rows:
            series.setdefault(u, []).append((t, e, v))
        assert set(out) == set(series)
        for u, s in series.items():
            acc = None
            for _, _, v in sorted(s):
                acc = v if acc is None else 0.2 * v + 0.8 * acc
            assert out[u] == pytest.approx(round(acc, 6), abs=2e-6), u


class TestPixelOps:
    """REAL pixel math on the uncompressed formats (PPM P6, 24-bit BMP):
    features and nearest-neighbor resize verified against hand-computed
    pixel arrays — no codec library involved."""

    @staticmethod
    def _ppm(arr):
        h, w, _ = arr.shape
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()

    @staticmethod
    def _bmp24(arr):
        """Bottom-up 24-bit BMP (BGR, 4-byte row padding) from an RGB
        (h, w, 3) array."""
        import struct

        import numpy as np

        h, w, _ = arr.shape
        stride = (w * 3 + 3) // 4 * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[:, :, ::-1].reshape(h, w * 3)  # RGB → BGR
        body = rows[::-1].tobytes()  # bottom-up
        return (
            b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
            + body
        )

    def test_pixel_features_real(self, spark):
        import numpy as np

        from fluent_plugin_sql_spark.operators.multimodal import (
            extract_pixel_features,
        )

        # 2x2: red, green / blue, white
        px = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
            np.uint8,
        )
        uniform = np.full((3, 4, 3), 77, np.uint8)
        df = spark.createDataFrame(
            [(1, self._ppm(px)), (2, self._bmp24(uniform))],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in extract_pixel_features(df, strict=True).collect()}
        # doc 1: channel means = (510/4, 510/4, 510/4) = 127.5 each
        assert out[1]["channel_means"] == [127.5, 127.5, 127.5]
        assert out[1]["brightness"] == 127.5
        # doc 2 (BMP round-trip): uniform 77 → std exactly 0
        assert out[2]["channel_means"] == [77.0, 77.0, 77.0]
        assert out[2]["channel_stds"] == [0.0, 0.0, 0.0]
        assert (out[2]["width"], out[2]["height"]) == (4, 3)

    def test_resize_nearest_neighbor_real(self, spark):
        import numpy as np

        from fluent_plugin_sql_spark.operators.multimodal import (
            _read_pixels,
            resize_images,
        )

        px = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
            np.uint8,
        )
        df = spark.createDataFrame([(1, self._ppm(px))], "doc_id long, payload binary")
        r = resize_images(df, 4, 4, strict=True).first()
        assert (r["width"], r["height"]) == (4, 4)
        got = _read_pixels(bytes(r["payload"]))
        # nearest-neighbor 2x upscale: each source pixel → 2x2 block
        expect = px.repeat(2, axis=0).repeat(2, axis=1)
        assert (got == expect).all()
        # BMP → resize round-trips through the BGR/bottom-up conversion
        bmp_df = spark.createDataFrame(
            [(2, self._bmp24(px))], "doc_id long, payload binary"
        )
        r2 = resize_images(bmp_df, 2, 2, strict=True).first()  # identity size
        assert (_read_pixels(bytes(r2["payload"])) == px).all()

    def test_compressed_formats_strict_boundary(self, spark):
        import pytest

        from fluent_plugin_sql_spark.operators.multimodal import (
            extract_pixel_features,
            resize_images,
        )

        png = (
            b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"IHDR"
            + b"\x00\x00\x00\x02\x00\x00\x00\x02" + bytes([8, 2, 0, 0, 0])
        )
        df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
        with pytest.raises(Exception, match="codec"):
            extract_pixel_features(df, strict=True).collect()
        assert resize_images(df, 2, 2, strict=False).count() == 0  # dropped


def test_interval_join_bucketized_matches_broadcast(spark):
    """J7 size guard (VERDICT r3/r4 item): a large interval side must NOT
    be broadcast — the bucketized equi-join path returns identical rows
    with no broadcast of the interval table in the plan."""
    events = spark.range(1000).select(
        F.col("id").alias("eid"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 97) % 86400).alias("t"),
    )
    iv = spark.range(300).select(
        F.col("id").alias("w"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 290).alias("s"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("id") * 290 + (F.col("id") % 7 + 1) * 60
        ).alias("e"),
    )
    want = {
        (r["eid"], r["w"])
        for r in interval_join(events, iv, "t", "s", "e", strategy="broadcast")
        .select("eid", "w")
        .collect()
    }
    assert want  # non-trivial overlap or the test proves nothing

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # auto must refuse to broadcast when the side exceeds the threshold
        bucketized = interval_join(events, iv, "t", "s", "e", strategy="auto")
        plan = bucketized._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastExchange" not in plan
        got = {(r["eid"], r["w"]) for r in bucketized.select("eid", "w").collect()}
        assert got == want

        # left join: unmatched left rows survive exactly once
        n_left = (
            interval_join(events, iv, "t", "s", "e", how="left", strategy="bucketize")
            .select("eid")
            .count()
        )
        matched_eids = {e for e, _ in want}
        assert n_left == len(want) + (1000 - len(matched_eids))

        # right/full can't be bucketized and must refuse to silently OOM
        import pytest as _pytest

        with _pytest.raises(ValueError):
            interval_join(events, iv, "t", "s", "e", how="full", strategy="auto")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_interval_join_auto_probe_memoized_and_size_hint(spark, monkeypatch):
    """The auto strategy's bounded row probe must run AT MOST ONCE per
    logical plan (poll loops rebuild the same join every trigger), and
    size_hint_rows must skip estimate + probe entirely."""
    from fluent_plugin_sql_spark.operators import asof as asof_mod
    from fluent_plugin_sql_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [(1, 5), (2, 15)], "id LONG, ts LONG"
    )
    right = spark.createDataFrame(
        [(0, 10, "w1"), (10, 20, "w2")], "s LONG, e LONG, tag STRING"
    )

    # patch the CONCRETE DataFrame class (Spark 4 splits the ABC from
    # classic/connect implementations; instances resolve count() there)
    DataFrame = type(right)
    calls = {"n": 0}
    orig_count = DataFrame.count

    def spy(self):
        calls["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "count", spy)
    monkeypatch.setattr(asof_mod, "_PROBE_MEMO", {})
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the estimate above threshold so auto reaches the probe
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        j1 = interval_join(left, right, "ts", "s", "e")
        first = calls["n"]
        assert first >= 1  # the probe ran once
        j2 = interval_join(left, right, "ts", "s", "e")
        assert calls["n"] == first  # memo hit: no second probe job
        # size_hint: fresh plan, no probe, no estimate needed
        right2 = spark.createDataFrame(
            [(0, 10, "w1")], "s LONG, e LONG, tag STRING"
        )
        interval_join(left, right2, "ts", "s", "e", size_hint_rows=1)
        assert calls["n"] == first
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    # decisions were identical: both plans produce the same rows
    assert sorted(r["tag"] for r in j1.collect()) == sorted(
        r["tag"] for r in j2.collect()
    )


def test_interval_join_size_hint_respects_disabled_broadcast(spark):
    """size_hint_rows replaces the size probe, NOT the broadcast policy:
    with autoBroadcastJoinThreshold disabled the auto strategy must fall
    through to the bucketized plan even for a tiny hinted side."""
    import datetime

    from fluent_plugin_sql_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 5))], "id LONG, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [("w", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2))],
        "w STRING, s TIMESTAMP, e TIMESTAMP",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = interval_join(left, right, "ts", "s", "e", size_hint_rows=1)
        plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "BroadcastNestedLoopJoin" not in plan
        assert out.count() == 1  # bucketized path, same answer
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_audio_rms_windows_real_signal_math(spark):
    """Real PCM decode + RMS: a synthesized stereo WAV with known
    window amplitudes must produce exact RMS values; non-WAV payloads
    raise in strict mode and drop otherwise."""
    import io
    import wave as wavmod

    import numpy as np
    import pytest as _pytest

    from fluent_plugin_sql_spark.operators.multimodal import audio_rms_windows

    # stereo: L = +A/-A square, R = silence -> mono mean amplitude A/2
    segs = []
    for w, amp in enumerate((200, 400)):
        left = np.empty(64, dtype="<i2")
        left[0::2], left[1::2] = amp, -amp
        right = np.zeros(64, dtype="<i2")
        inter = np.empty(128, dtype="<i2")
        inter[0::2], inter[1::2] = left, right
        segs.append(inter)
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(np.concatenate(segs).tobytes())

    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, payload binary")
    got = {r["window_idx"]: r for r in audio_rms_windows(df, n_windows=2).collect()}
    assert got[0]["rms"] == 100.0 and got[1]["rms"] == 200.0
    assert got[0]["n_samples"] == 64

    bad = spark.createDataFrame([(2, bytearray(b"not audio at all"))],
                                "doc_id long, payload binary")
    with _pytest.raises(Exception, match="codec"):
        audio_rms_windows(bad, strict=True).collect()
    assert audio_rms_windows(bad, strict=False).count() == 0


def test_audio_truncated_payload_follows_strict_contract(spark):
    """A WAV whose data chunk claims more bytes than exist (odd-length
    remainder) must flow through the strict/drop contract, not crash
    numpy's frombuffer."""
    import io
    import struct
    import wave as wavmod

    import numpy as np
    import pytest as _pytest

    from fluent_plugin_sql_spark.operators.multimodal import audio_rms_windows

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(np.full(64, 100, dtype="<i2").tobytes())
    payload = bytearray(buf.getvalue())[:-3]  # truncate mid-sample

    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    # still decodes the whole samples that remain — no crash
    out = audio_rms_windows(df, n_windows=1, strict=False).collect()
    assert len(out) == 1 and out[0]["rms"] == 100.0
