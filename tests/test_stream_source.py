"""The streaming-native incremental source (SURVEY §3.1): reference poll
semantics as a real Spark streaming source whose watermark offset lives in
Spark's checkpoint — select_limit batching, exact resume after restart."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.sources.stream_source import incremental_stream


def _write_rows(path, ids):
    pq.write_table(
        pa.table(
            {"event_id": pa.array(ids, pa.int64()),
             "value": pa.array([float(i) * 1.5 for i in ids], pa.float64())}
        ),
        path,
    )


def _drain(q, sink_count, expect, timeout=60):
    """Run until the memory sink holds ``expect`` rows (then settle)."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            if sink_count() >= expect:
                break
        except Exception:  # memory table not registered until first batch
            pass
        time.sleep(0.3)
    # let any in-flight batch commit, then stop
    time.sleep(1.0)
    q.stop()
    q.awaitTermination(30)


@pytest.fixture()
def table_dir(tmp_path):
    d = tmp_path / "events_tbl"
    d.mkdir()
    _write_rows(str(d / "part0.parquet"), range(250))
    return d


def test_stream_tails_table_in_select_limit_batches(spark, table_dir, tmp_path):
    df = incremental_stream(spark, str(table_dir), "event_id", select_limit=100)
    q = (
        df.writeStream.format("memory")
        .queryName("tail1")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    count = lambda: spark.sql("SELECT count(*) c FROM tail1").first()["c"]
    _drain(q, count, 250)
    assert count() == 250
    # exactly-once within the run: no duplicated ids
    assert spark.sql("SELECT count(DISTINCT event_id) c FROM tail1").first()["c"] == 250
    # select_limit respected per micro-batch
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert sizes and max(sizes) <= 100 and len(sizes) >= 3


def test_restart_resumes_from_spark_checkpoint(spark, table_dir, tmp_path):
    # file sink: supports checkpoint recovery (the memory sink does not)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def out_count():
        return spark.read.parquet(out).count()

    df = incremental_stream(spark, str(table_dir), "event_id", select_limit=100)
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
    )
    _drain(q, out_count, 250)
    assert out_count() == 250

    # table grows while the query is DOWN
    _write_rows(str(table_dir / "part1.parquet"), range(250, 330))

    df2 = incremental_stream(spark, str(table_dir), "event_id", select_limit=100)
    q2 = (
        df2.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
    )
    _drain(q2, out_count, 330)
    # ONLY the new rows were appended: the watermark offset came from
    # Spark's checkpoint, not from re-reading the table
    got = [r["event_id"] for r in spark.read.parquet(out).orderBy("event_id").collect()]
    assert got == list(range(330))


def test_streaming_agg_over_incremental_source(spark, table_dir, tmp_path):
    """The source feeds normal downstream plans (executor-side work)."""
    df = incremental_stream(spark, str(table_dir), "event_id", select_limit=200)
    agg = df.groupBy((F.col("event_id") % 5).alias("k")).agg(
        F.sum("value").alias("total")
    )
    q = (
        agg.writeStream.format("memory").queryName("tail3")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    count = lambda: spark.sql("SELECT coalesce(sum(0),0) FROM tail3").first()[0] + (
        spark.sql("SELECT count(*) c FROM tail3").first()["c"]
    )
    t0 = time.time()
    while time.time() - t0 < 60:
        rows = spark.sql("SELECT sum(total) s FROM tail3").first()
        if rows["s"] is not None and abs(rows["s"] - sum(i * 1.5 for i in range(250))) < 1e-6:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    assert abs(spark.sql("SELECT sum(total) s FROM tail3").first()["s"]
               - sum(i * 1.5 for i in range(250))) < 1e-6


def test_pipeline_streaming_mode_end_to_end(spark, table_dir, tmp_path):
    """Config-driven continuous mode: streaming-native source → tag
    router → parquet sink, offsets in the Spark checkpoint."""
    from fluent_plugin_sql_spark.pipeline import Pipeline

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    # single-file parquet table, reference layout {path}/{table}.parquet
    _write_rows(str(src_dir / "events.parquet"), range(500))
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "tag_prefix": "db",
            "select_limit": 200,
            "tables": [{"table": "events", "update_column": "event_id"}],
        },
        "sink": {
            "path": str(out),
            "tables": [{"table": "routed_events"}],
        },
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "routed_events")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 60 and done() < 500:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = spark.read.parquet(str(out / "routed_events"))
    assert got.count() == 500
    assert got.select("tag").distinct().collect()[0]["tag"] == "db.events"
    assert got.select(F.countDistinct("event_id")).first()[0] == 500


def test_stream_picks_up_live_appends(spark, table_dir, tmp_path):
    """Rows appended while the query is RUNNING flow through on a later
    micro-batch (the reader re-lists the table dir per poll) — the actual
    continuous-tailing deployment shape."""
    df = incremental_stream(spark, str(table_dir), "event_id", select_limit=100)
    q = (
        df.writeStream.format("memory").queryName("live_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    count = lambda: spark.sql("SELECT count(*) c FROM live_tail").first()["c"]
    try:
        t0 = time.time()
        while time.time() - t0 < 60 and count() < 250:
            time.sleep(0.3)
        assert count() == 250
        # live append while the query keeps running
        _write_rows(str(table_dir / "part_live.parquet"), range(250, 300))
        t0 = time.time()
        while time.time() - t0 < 60 and count() < 300:
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = sorted(r["event_id"] for r in spark.sql("SELECT event_id FROM live_tail").collect())
    assert got == list(range(300))


def test_partitioned_backfill_reads_on_executors(spark, tmp_path):
    """partitioned=true: one micro-batch covers the whole backlog, split
    into ~select_limit-row watermark ranges — one executor TASK each (we
    count the parquet part-files the single batch produced), with
    restart-resume still exact."""
    d = tmp_path / "tbl"
    d.mkdir()
    _write_rows(str(d / "part0.parquet"), range(600))
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def out_count():
        return spark.read.parquet(out).count()

    df = incremental_stream(spark, str(d), "event_id", select_limit=100, partitioned=True)
    q = df.writeStream.format("parquet").option("path", out).option(
        "checkpointLocation", ckpt).start()
    _drain(q, out_count, 600)
    assert out_count() == 600
    # the whole backlog arrived as ONE micro-batch...
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert sizes == [600]
    # ...read by >1 task: the parquet sink writes one file per non-empty task
    import glob
    files = [f for f in glob.glob(f"{out}/part-*") if not f.endswith(".crc")]
    assert len(files) >= 4, files  # 600 rows / 100-row ranges

    # grows while down; restart resumes exactly (offset = table head, monotone)
    _write_rows(str(d / "part1.parquet"), range(600, 750))
    df2 = incremental_stream(spark, str(d), "event_id", select_limit=100, partitioned=True)
    q2 = df2.writeStream.format("parquet").option("path", out).option(
        "checkpointLocation", ckpt).start()
    _drain(q2, out_count, 750)
    got = [r["event_id"] for r in spark.read.parquet(out).orderBy("event_id").collect()]
    assert got == list(range(750))


def test_select_limit_cap_extends_through_watermark_ties(spark, tmp_path):
    """If the row cap cuts through rows SHARING the boundary watermark
    value, the batch extends through the ties — the strict '>' lower
    bound of the next poll would otherwise skip them forever."""
    d = tmp_path / "tbl"
    d.mkdir()
    # watermark column 'grp' has heavy duplicates: 80 rows per value
    ids = list(range(400))
    pq.write_table(
        pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "grp": pa.array([i // 80 for i in ids], pa.int64()),
        }),
        str(d / "part0.parquet"),
    )
    df = incremental_stream(spark, str(d), "grp", select_limit=100)
    q = (
        df.writeStream.format("memory").queryName("ties_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    count = lambda: spark.sql("SELECT count(*) c FROM ties_tail").first()["c"]
    _drain(q, count, 400)
    assert count() == 400
    assert spark.sql("SELECT count(DISTINCT event_id) c FROM ties_tail").first()["c"] == 400
    # batches exceed the cap only up to the tie group, never wildly
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert sizes and max(sizes) <= 160  # cap 100 extended through one 80-row group


def test_streaming_pipeline_upsert_sink_cdc(spark, tmp_path):
    """CDC-to-lake through the STREAMING pipeline: a change log whose
    keys repeat (k = event_id % 250) flows through sink mode 'upsert' —
    the lake table converges to exactly one row per key holding the
    LATEST change, across micro-batch boundaries and within a batch
    (order_column reduces multi-change batches to last-per-key)."""
    from fluent_plugin_sql_spark.pipeline import Pipeline

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    # change log: 500 changes over 250 keys (each key changed twice)
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(500), pa.int64()),
             "k": pa.array([i % 250 for i in range(500)], pa.int64()),
             "value": pa.array([float(i) for i in range(500)], pa.float64())}
        ),
        str(src_dir / "events.parquet"),
    )
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "tag_prefix": "db",
            "select_limit": 200,  # batches cut MID-KEY-CYCLE: [0,200) spans
            # keys 0-199, [200,400) re-changes 200-249 then 0-149, ...
            "tables": [{"table": "events", "update_column": "event_id"}],
        },
        "sink": {
            "path": str(out),
            "mode": "upsert",
            "merge_keys": ["k"],
            "order_column": "event_id",
            "tables": [{"table": "kv"}],
        },
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def settled():
            try:
                df = spark.read.parquet(str(out / "kv"))
                return df.count() == 250 and df.agg(
                    F.max("event_id")
                ).first()[0] == 499
            except Exception:
                return False
        t0 = time.time()
        while time.time() - t0 < 90 and not settled():
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = spark.read.parquet(str(out / "kv"))
    assert got.count() == 250  # one row per key, no append-duplicates
    vals = {r["k"]: r["event_id"] for r in got.collect()}
    # latest change per key wins: key k's last change is event 250+k
    assert all(vals[k] == 250 + k for k in range(250))


def test_run_streaming_near_dedup_config(spark, tmp_path):
    """source.near_dedup interposes the MinHash signature store: the
    near-copy arriving in a LATER micro-batch (select_limit splits the
    table) never reaches the sink; novel docs all do."""
    import time

    from fluent_plugin_sql_spark.pipeline import Pipeline

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    fillers = [
        f"unique document number {i} about topic {i * 7} with entirely fresh "
        f"vocabulary item{i} token{i * 3} word{i * 11} phrase{i * 13}"
        for i in range(3)
    ]
    rows = [(0, base), (1, fillers[0]), (2, fillers[1]),
            # second micro-batch (select_limit=3): near-copy of doc 0 + novel
            (3, base.replace("green", "dark")), (4, fillers[2])]

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(1).write.parquet(
        str(src_dir / "documents.parquet")
    )
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 3,
            "tables": [{"table": "documents", "update_column": "doc_id"}],
            "near_dedup": {
                "path": str(tmp_path / "ndstore"),
                "text_col": "text",
                "id_col": "doc_id",
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean_docs"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean_docs")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 4:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["doc_id"] for r in spark.read.parquet(str(out / "clean_docs")).collect()}
    assert got == {0, 1, 2, 4}  # 3 = near-copy of 0, filtered via the store


def test_latest_offset_memoizes_footer_reads(tmp_path):
    """Per-file maxima are cached across triggers: a second latestOffset
    over an unchanged directory reads ZERO footers, and adding one file
    costs exactly one more read (VERDICT r3/r4 carried item)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_plugin_sql_spark.sources.stream_source import (
        _PartitionedIncrementalReader,
    )

    d = tmp_path / "tbl"
    d.mkdir()
    pq.write_table(pa.table({"id": [1, 2, 3]}), d / "a.parquet")
    pq.write_table(pa.table({"id": [4, 5]}), d / "b.parquet")

    r = _PartitionedIncrementalReader(str(d), "id", 10)
    assert r.latestOffset()["last"] is not None
    assert r.footer_reads == 2

    # trigger 2, nothing new: listing only, no footer re-reads
    off2 = r.latestOffset()
    assert r.footer_reads == 2

    # one new file: exactly one more footer read, offset advances
    pq.write_table(pa.table({"id": [9]}), d / "c.parquet")
    off3 = r.latestOffset()
    assert r.footer_reads == 3
    assert off3 != off2


def test_run_streaming_exact_dedup_config(spark, tmp_path):
    """source.exact_dedup interposes the content-hash store: an EXACT
    copy arriving in a later micro-batch never reaches the sink; a
    near-copy (one word changed) passes — that's near_dedup's job."""
    import time

    from fluent_plugin_sql_spark.pipeline import Pipeline

    base = "some document text that repeats verbatim in a later batch"
    rows = [(0, base), (1, "first unique filler document text"),
            (2, "second unique filler document text"),
            # second micro-batch: exact copy of 0 + near copy of 0 + novel
            (3, base), (4, base.replace("repeats", "rhymes")),
            (5, "third unique filler document text")]

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(1).write.parquet(
        str(src_dir / "documents.parquet")
    )
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 3,
            "tables": [{"table": "documents", "update_column": "doc_id"}],
            "exact_dedup": {
                "path": str(tmp_path / "xdstore"),
                "text_col": "text",
                "id_col": "doc_id",
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean_docs"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean_docs")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 5:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["doc_id"] for r in spark.read.parquet(str(out / "clean_docs")).collect()}
    assert got == {0, 1, 2, 4, 5}  # 3 = exact copy of 0, filtered


def test_run_streaming_embedding_dedup_config(spark, tmp_path):
    """source.embedding_dedup interposes the IVF vector store: a later
    micro-batch's near-parallel embedding never reaches the sink."""
    import time

    from fluent_plugin_sql_spark.pipeline import Pipeline

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        # second micro-batch: near-copy of vec 0 + novel direction
        (3, [0.995, 0.005, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>"
    ).coalesce(1).write.parquet(str(src_dir / "embeddings.parquet"))
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 3,
            "tables": [{"table": "embeddings", "update_column": "vec_id"}],
            "embedding_dedup": {
                "path": str(tmp_path / "edstore"),
                "vec_col": "embedding",
                "id_col": "vec_id",
                "threshold": 0.95,
                "num_centroids": 3,
                "nprobe": 2,
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean_vecs"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean_vecs")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 4:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["vec_id"] for r in spark.read.parquet(str(out / "clean_vecs")).collect()}
    assert got == {0, 1, 2, 4}  # 3 = near-parallel to 0, filtered


def test_run_streaming_rollup_config(spark, tmp_path):
    """source.rollup maintains a RollupStore continuous aggregate over
    the rows that reach the sink: after the stream drains, the store's
    snapshot equals a direct aggregation of the source — and because
    absorbs key on epoch id, a replayed micro-batch cannot double-count."""
    import datetime
    import time

    from fluent_plugin_sql_spark.operators.rollup import RollupStore
    from fluent_plugin_sql_spark.pipeline import Pipeline

    t0h = datetime.datetime(2024, 3, 1)
    rows = [
        (i, t0h + datetime.timedelta(minutes=7 * i), float(i))
        for i in range(40)
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, value DOUBLE"
    ).coalesce(1).write.parquet(str(src_dir / "events.parquet"))
    out = tmp_path / "out"
    rpath = tmp_path / "rollup"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 15,  # forces multiple micro-batches
            "tables": [{"table": "events", "update_column": "event_id"}],
            "rollup": {
                "path": str(rpath),
                "time_col": "ts",
                "window": "1 hour",
                "sum_cols": ["value"],
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "routed"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "routed")).count()
            except Exception:
                return 0
        t1 = time.time()
        while time.time() - t1 < 90 and done() < 40:
            time.sleep(0.5)
        # the sink write precedes the rollup absorb inside the handler;
        # drain fully so the LAST epoch's absorb isn't cut off mid-flight
        # (on a real restart that epoch would simply replay and commit)
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    assert done() == 40
    store = RollupStore(
        spark, str(rpath / "events"), "ts", "1 hour", sum_cols=("value",)
    )
    got = {
        r["w_start"]: (r["rc"], r["s_value"])
        for r in store.snapshot().collect()
    }
    src = spark.read.parquet(str(src_dir / "events.parquet"))
    want = {
        r["w"]: (r["rc"], r["s"])
        for r in src.groupBy(F.date_trunc("hour", "ts").alias("w"))
        .agg(F.count(F.lit(1)).alias("rc"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
    # replaying an already-committed epoch is a no-op
    assert store.absorb(src.limit(5), "events-e0") is False


def test_run_streaming_simhash_dedup_config(spark, tmp_path):
    """source.simhash_dedup interposes the pigeonhole block store: a
    near-copy (one word changed, hamming << 6) arriving in a later
    micro-batch never reaches the sink; genuinely different docs pass."""
    import time

    from fluent_plugin_sql_spark.pipeline import Pipeline

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from every hunter")
    rows = [(0, base),
            (1, "completely different content about spark shuffles "
                "partitions and broadcast joins at terabyte scale"),
            (2, "yet another unrelated document mentioning watermarks "
                "streaming state stores checkpoints and sinks"),
            # second micro-batch: near copy of 0 + two novel docs
            (3, base.replace("green", "dark")),
            (4, "fresh and unrelated words about parquet footers page "
                "statistics bloom filters and row group pruning"),
            (5, "final novel text with its own vocabulary entirely "
                "disjoint from everything that came before today")]

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(1).write.parquet(
        str(src_dir / "documents.parquet")
    )
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 3,
            "tables": [{"table": "documents", "update_column": "doc_id"}],
            "simhash_dedup": {
                "path": str(tmp_path / "sdstore"),
                "text_col": "text",
                "id_col": "doc_id",
                "max_hamming": 6,
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean_docs"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean_docs")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 5:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["doc_id"] for r in spark.read.parquet(str(out / "clean_docs")).collect()}
    assert got == {0, 1, 2, 4, 5}  # 3 = near copy of 0, filtered


def test_run_streaming_ivf_index_config(spark, tmp_path):
    """source.ivf_index maintains a persisted, searchable IVF index over
    the rows that reach the sink: after the stream drains (multiple
    micro-batches), the index holds every id exactly once and a search
    against it returns the true nearest neighbor."""
    import math
    import time

    from fluent_plugin_sql_spark.operators.similarity import ivf_topk_from_index
    from fluent_plugin_sql_spark.pipeline import Pipeline

    # 24 unit-ish vectors on a circle: nearest neighbor = adjacent angle
    rows = [
        (i, [math.cos(2 * math.pi * i / 24), math.sin(2 * math.pi * i / 24)])
        for i in range(24)
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
    ).coalesce(1).write.parquet(str(src_dir / "embeddings.parquet"))
    out = tmp_path / "out"
    ipath = tmp_path / "ivf"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 9,  # forces multiple micro-batches
            "tables": [{"table": "embeddings", "update_column": "vec_id"}],
            "ivf_index": {
                "path": str(ipath),
                "vec_col": "embedding",
                "id_col": "vec_id",
                "num_centroids": 4,
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "routed"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        # wait on the INDEX, not the sink: the sink write precedes the
        # index append inside the same micro-batch, so stopping at
        # sink==24 races the final batch's append and interrupts it
        def done():
            try:
                return (
                    spark.read.parquet(str(ipath / "embeddings" / "postings"))
                    .count()
                )
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 24:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)

    postings = spark.read.parquet(str(ipath / "embeddings" / "postings"))
    got = sorted(r["match_id"] for r in postings.collect())
    assert got == list(range(24))  # every id exactly once, replays deduped

    # the index answers searches: each query vector's top hit (excluding
    # itself) is an angular neighbor
    qdf = spark.createDataFrame(rows[:4], "vec_id LONG, embedding ARRAY<DOUBLE>")
    hits = ivf_topk_from_index(
        spark, str(ipath / "embeddings"), qdf, k=2, nprobe=3
    ).collect()
    for r in hits:
        if r["match_id"] != r["query_id"]:
            assert min(
                abs(r["match_id"] - r["query_id"]),
                24 - abs(r["match_id"] - r["query_id"]),
            ) <= 3


def test_run_streaming_quality_filter_config(spark, tmp_path):
    """source.quality_filter drops low-quality rows before the dedup
    stores: a too-short doc and a zero-diversity doc never reach the
    sink, and (composed with exact_dedup) never pollute store state."""
    import time

    from fluent_plugin_sql_spark.pipeline import Pipeline

    rows = [
        (0, "a genuinely fine document with plenty of distinct meaningful tokens here"),
        (1, "too short"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, "another acceptable document carrying enough varied vocabulary to pass easily"),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(1).write.parquet(
        str(src_dir / "documents.parquet")
    )
    out = tmp_path / "out"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 2,
            "tables": [{"table": "documents", "update_column": "doc_id"}],
            "quality_filter": {
                "text_col": "text",
                "min_tokens": 5,
                "min_ttr": 0.5,
            },
            "exact_dedup": {
                "path": str(tmp_path / "xd"),
                "text_col": "text",
                "id_col": "doc_id",
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 2:
            time.sleep(0.5)
        time.sleep(2)  # allow the final batch's absorb to finish
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["doc_id"] for r in spark.read.parquet(str(out / "clean")).collect()}
    assert got == {0, 3}  # 1 = too short, 2 = zero diversity
    # rejected rows never entered store state
    hashes = spark.read.parquet(str(tmp_path / "xd" / "documents" / "hashes"))
    assert hashes.count() == 2


def test_run_streaming_semantic_dedup_config(spark, tmp_path):
    """source.semantic_dedup interposes the SemDeDup-style store:
    centroids are k-means-TRAINED on the first absorbed micro-batch
    (semantic clusters, not arbitrary hash picks), later batches probe
    same-cluster (nprobe=1) and near-parallel embeddings never reach
    the sink; replayed state converges exactly-once by id."""
    import time

    from fluent_plugin_sql_spark.pipeline import Pipeline

    rows = [
        # first micro-batch: three well-separated semantic modes
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        # second micro-batch: near-copy of 0 (same cluster -> pruned),
        # novel direction (kept)
        (3, [0.995, 0.005, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>"
    ).coalesce(1).write.parquet(str(src_dir / "embeddings.parquet"))
    out = tmp_path / "out"
    store_path = tmp_path / "smstore"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 3,
            "tables": [{"table": "embeddings", "update_column": "vec_id"}],
            "semantic_dedup": {
                "path": str(store_path),
                "vec_col": "embedding",
                "id_col": "vec_id",
                "tau": 0.95,
                "k": 3,
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean_vecs"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean_vecs")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 90 and done() < 4:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["vec_id"] for r in spark.read.parquet(str(out / "clean_vecs")).collect()}
    assert got == {0, 1, 2, 4}  # 3 = same-cluster near-dup of 0, pruned
    # the frozen centroids are k-means OUTPUT ids (0..k-1 from the
    # trained table), not first-batch doc ids by hash — and there are k
    cents = spark.read.parquet(str(store_path / "embeddings" / "centroids"))
    ids = sorted(r.centroid_id for r in cents.collect())
    assert ids == [0, 1, 2]


def test_semantic_store_kmeans_mode_replay_converges(spark, tmp_path):
    """centroid_mode='kmeans' store: double-absorb of the same batch is
    a no-op for probes (replay converges — the exactly-once-by-id
    contract), and trained centroids drive same-cluster pruning."""
    from fluent_plugin_sql_spark.operators.dedup import EmbeddingDedupStore

    st = EmbeddingDedupStore(
        spark, str(tmp_path / "sm"), threshold=0.95,
        num_centroids=2, nprobe=1, centroid_mode="kmeans",
    )
    b1 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    assert st.probe_dups(b1, "embedding", "vec_id").count() == 0
    st.absorb(b1, "embedding", "vec_id")
    st.absorb(b1, "embedding", "vec_id")  # replay: same state semantics
    b2 = spark.createDataFrame(
        [(2, [0.999, 0.001, 0.0, 0.0]), (3, [0.0, 0.0, 1.0, 0.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    dups = {r.dup for r in st.probe_dups(b2, "embedding", "vec_id").collect()}
    assert dups == {2}
    # replayed batch probes as dups of itself -> empty survivors
    rep = {r.dup for r in st.probe_dups(b1, "embedding", "vec_id").collect()}
    assert rep == {0, 1}


def test_semantic_store_rejects_unknown_mode(spark, tmp_path):
    from fluent_plugin_sql_spark.operators.dedup import EmbeddingDedupStore

    import pytest as _pytest

    with _pytest.raises(ValueError, match="centroid_mode"):
        EmbeddingDedupStore(
            spark, str(tmp_path / "x"), centroid_mode="typo"
        )
