"""Lake sinks (partition pruning, bucketed shuffle-free joins) and
scale-op semantics (SCD2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.io import load_table
from fluent_plugin_sql_spark.operators.scale import scd2_apply
from fluent_plugin_sql_spark.sinks.lake import write_bucketed, write_partitioned
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    e = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_part")
    write_partitioned(e, out, ["dt"])
    back = spark.read.parquet(out)
    q = back.where(F.col("dt") == "2024-01-03")
    plan = plan_of(q)
    # partition filter must reach the scan as a PartitionFilters entry
    assert "PartitionFilters: [isnotnull(dt" in plan
    assert q.count() == e.where(F.col("dt") == "2024-01-03").count() > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previous session's metastore is gone but its warehouse files may
    # persist → LOCATION_ALREADY_EXISTS; clear the locations too
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"]
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderstatus").count()
    plan = plan_of(joined.withColumn("x", F.lit(1)))
    # co-bucketed equi-join: no Exchange feeding the join
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_section.split("SortMergeJoin")[0] or (
        "BroadcastExchange" in join_section
    )
    # correctness unchanged
    expected = (
        o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))


def test_scd2_apply_versions(spark):
    base = spark.createDataFrame(
        [
            (1, "alice", None, True),
            (2, "bob", None, True),
            (1, "alice_old", dt.datetime(2023, 1, 1), False),
        ],
        ["id", "name", "valid_to", "is_current"],
    ).withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    updates = spark.createDataFrame([(1, "alice_new")], ["id", "name"])
    out = scd2_apply(base, updates, ["id"], ts_col="valid_to")
    rows = {(r["id"], r["name"]): (r["is_current"], r["valid_to"] is None) for r in out.collect()}
    assert rows[(2, "bob")] == (True, True)  # untouched
    assert rows[(1, "alice")] == (False, False)  # closed out
    assert rows[(1, "alice_old")] == (False, False)  # stays historical
    assert rows[(1, "alice_new")] == (True, True)  # new current version
    assert out.count() == 4


def test_compact_parquet_dir_preserves_rows_and_prunes(spark, tmp_path):
    """Compaction: many micro-batch files → few sorted files, same rows,
    and range-clustered files give parquet min/max pruning on the sort
    column."""
    import glob

    from fluent_plugin_sql_spark.sinks.lake import compact_parquet_dir

    path = str(tmp_path / "sink")
    # simulate 20 micro-batch appends (one file each)
    for i in range(20):
        (
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id AS event_id", "id * 1.5 AS value")
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )
    assert len(glob.glob(f"{path}/*.parquet")) == 20
    before = spark.read.parquet(path)
    before_sum = before.agg({"value": "sum"}).first()[0]

    n_files = compact_parquet_dir(
        spark, path, target_rows_per_file=500, sort_cols=["event_id"]
    )
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n_files == 4
    after = spark.read.parquet(path)
    assert after.count() == 2000
    assert abs(after.agg({"value": "sum"}).first()[0] - before_sum) < 1e-9
    # range clustering: each file's event_id span is disjoint
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint → min/max pruning works


def test_salted_join_matches_plain_join(spark):
    """Salted join must be a pure plan transformation: same rows as the
    plain equi-join, hot key spread over salt buckets."""
    from fluent_plugin_sql_spark.operators.scale import salted_join

    # pathological skew: 90% of the big side is one key
    big = spark.range(10_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "id AS payload"
    )
    small = spark.range(7).selectExpr("id AS k", "id * 100 AS attr")
    plain = big.join(small, "k").selectExpr("k", "payload", "attr")
    salted = salted_join(big, small, "k", salt_buckets=8).selectExpr(
        "k", "payload", "attr"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_compact_parquet_dir_crash_window_recovery(spark, tmp_path):
    """Round-3 ADVICE lake.py:96: the two-rename swap is not atomic as a
    pair — a crash between them leaves no live directory.  The window is
    self-healing: on entry the leftover ``.__compact_old__`` is rolled
    back to live (and any stale staging dropped) before the rewrite."""
    import glob
    import os

    from fluent_plugin_sql_spark.sinks.lake import compact_parquet_dir

    path = str(tmp_path / "sink")
    for i in range(4):
        (
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id AS event_id", "id * 2.0 AS value")
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )
    # simulate the crash: live renamed away, second rename never ran, and
    # a stale staging dir from the dead attempt is still lying around
    os.rename(path, path + ".__compact_old__")
    os.makedirs(path + ".__compact_tmp__")
    assert not os.path.exists(path)

    n_files = compact_parquet_dir(spark, path, target_rows_per_file=200)
    assert n_files == 2
    assert len(glob.glob(f"{path}/*.parquet")) == 2
    assert not os.path.exists(path + ".__compact_old__")
    assert not os.path.exists(path + ".__compact_tmp__")
    after = spark.read.parquet(path)
    assert after.count() == 400
    assert after.agg({"value": "sum"}).first()[0] == sum(i * 2.0 for i in range(400))

    # crash AFTER the swap (old left behind, live intact): old is dropped,
    # live is authoritative
    import shutil

    shutil.copytree(path, path + ".__compact_old__")
    n_files = compact_parquet_dir(spark, path, target_rows_per_file=400)
    assert n_files == 1
    assert not os.path.exists(path + ".__compact_old__")
    assert spark.read.parquet(path).count() == 400


def test_merge_into_parquet_unpartitioned(spark, tmp_path):
    """Lake MERGE (full-table strategy): updates replace matching keys,
    inserts pass through, first write degrades to plain write, and the
    swap leaves no staging debris."""
    import glob
    import os

    from fluent_plugin_sql_spark.sinks.lake import merge_into_parquet

    path = str(tmp_path / "dim")
    base = spark.range(0, 100).selectExpr("id AS k", "id * 1.0 AS v")
    merge_into_parquet(spark, path, base, ["k"])  # first write
    assert spark.read.parquet(path).count() == 100

    updates = spark.range(90, 110).selectExpr("id AS k", "id * -1.0 AS v")
    merge_into_parquet(spark, path, updates, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 110
    assert got[5] == 5.0          # untouched
    assert got[95] == -95.0       # updated
    assert got[105] == -105.0     # inserted
    assert not glob.glob(str(tmp_path / "dim.__compact_*"))
    assert not os.path.exists(path + ".__compact_old__")


def test_merge_into_parquet_partitioned_touches_only_affected(spark, tmp_path):
    """Lake MERGE (partition-local strategy): only the partitions the
    update batch touches are read and rewritten — untouched partition
    files are bit-identical afterwards."""
    import glob
    import os

    from fluent_plugin_sql_spark.sinks.lake import merge_into_parquet

    path = str(tmp_path / "fact")
    base = spark.range(0, 400).selectExpr(
        "id AS k", "CAST(id % 4 AS INT) AS p", "id * 1.0D AS v"
    )
    merge_into_parquet(spark, path, base, ["k"], partition_cols=["p"])
    untouched_before = {
        f: (os.stat(f).st_mtime_ns, os.stat(f).st_size)
        for f in glob.glob(f"{path}/p=0/*.parquet") + glob.glob(f"{path}/p=2/*.parquet")
        + glob.glob(f"{path}/p=3/*.parquet")
    }
    assert untouched_before

    # updates touch ONLY p=1 (keys stay in their partition) + a new p=9
    updates = spark.createDataFrame(
        [(1, 1, -1.0), (5, 1, -5.0), (901, 9, 901.0)], "k LONG, p INT, v DOUBLE"
    )
    merge_into_parquet(spark, path, updates, ["k"], partition_cols=["p"])

    got = spark.read.parquet(path)
    assert got.count() == 401  # 400 base + 1 insert (2 upserts replaced)
    vals = {r["k"]: r["v"] for r in got.where("p = 1 OR p = 9").collect()}
    assert vals[1] == -1.0 and vals[5] == -5.0 and vals[901] == 901.0
    assert {r["v"] for r in got.where("k = 9").collect()} == {9.0}

    untouched_after = {
        f: (os.stat(f).st_mtime_ns, os.stat(f).st_size)
        for f in glob.glob(f"{path}/p=0/*.parquet") + glob.glob(f"{path}/p=2/*.parquet")
        + glob.glob(f"{path}/p=3/*.parquet")
    }
    assert untouched_after == untouched_before  # never read, never rewritten
    # live tree stays clean (backups live OUTSIDE it, and are gone)
    assert not glob.glob(f"{path}/*__old__*")
    assert not os.path.exists(str(tmp_path / "fact.__merge_old__"))
    assert not os.path.exists(str(tmp_path / "fact.__compact_tmp__"))


def test_merge_into_parquet_partitioned_crash_recovery_and_guards(spark, tmp_path):
    """Crash window of the per-partition swap: a backup left with its
    live partition MISSING is restored on the next merge (no data loss,
    live tree never polluted); unsupported partition values (NULL,
    Hive-escaped specials) are refused loudly instead of silently
    dropping rows."""
    import glob
    import os
    import shutil

    import pytest

    from fluent_plugin_sql_spark.sinks.lake import merge_into_parquet

    path = str(tmp_path / "fact")
    base = spark.range(0, 200).selectExpr(
        "id AS k", "CAST(id % 2 AS INT) AS p", "id * 1.0D AS v"
    )
    merge_into_parquet(spark, path, base, ["k"], partition_cols=["p"])

    # simulate the crash between the two renames: live p=1 moved to the
    # backup root, staged data lost with the process
    os.makedirs(path + ".__merge_old__")
    shutil.move(f"{path}/p=1", path + ".__merge_old__/p=1")
    assert not os.path.exists(f"{path}/p=1")

    updates = spark.createDataFrame([(0, 0, -0.5)], "k LONG, p INT, v DOUBLE")
    merge_into_parquet(spark, path, updates, ["k"], partition_cols=["p"])

    got = spark.read.parquet(path)
    assert got.count() == 200  # p=1's 100 rows recovered, p=0 merged
    assert got.where("k = 0").first()["v"] == -0.5
    assert got.where("p = 1").count() == 100
    assert not os.path.exists(path + ".__merge_old__")

    # unsupported partition values are refused, not silently dropped
    with pytest.raises(ValueError, match="partition value"):
        merge_into_parquet(
            spark, path,
            spark.createDataFrame([(1, None, 1.0)], "k LONG, p INT, v DOUBLE"),
            ["k"], partition_cols=["p"],
        )
    str_part = str(tmp_path / "strfact")
    with pytest.raises(ValueError, match="escaping"):
        merge_into_parquet(
            spark, str_part,
            spark.createDataFrame([(1, "a b", 1.0)], "k LONG, p STRING, v DOUBLE"),
            ["k"], partition_cols=["p"],
        )


# round 6: z-order clustering


def _file_stats(path, cols):
    """Per-file (min, max) of ``cols`` from parquet footers — the same
    stats the reader's predicate pushdown skips row-groups with."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(names[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _hit_fraction(stats, col, lo, hi):
    hits = sum(1 for s in stats if not (s[col][1] < lo or s[col][0] > hi))
    return hits / len(stats)


def test_zorder_write_skips_files_on_every_clustered_column(spark, tmp_path):
    """Z-ordered layout must make per-file min/max stats selective on
    BOTH clustered columns simultaneously; a plain sorted layout is only
    selective on its leading column and a hash layout on neither."""
    from fluent_plugin_sql_spark.sinks.lake import write_zordered

    e = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zpath, hpath, spath = (str(tmp_path / n) for n in ("z", "h", "s"))
    write_zordered(e, zpath, ["user_id", "value"], num_files=16, bits_per_col=4)
    e.repartition(16).write.parquet(hpath)  # hash layout control
    # single-column sort control: perfect on user_id, blind on value
    e.repartitionByRange(16, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(spath)

    # identical contents (clustering is a layout change, not a transform)
    assert (
        spark.read.parquet(zpath).orderBy("event_id").collect()
        == e.orderBy("event_id").collect()
    )

    zs = _file_stats(zpath, ["user_id", "value"])
    hs = _file_stats(hpath, ["user_id", "value"])
    ss = _file_stats(spath, ["user_id", "value"])
    # selective range on each dimension (~1/4 of the domain)
    # ~quarter of each dimension BY MASS (bins are equal-frequency):
    # user_id 0-3 of 0-14; value [0, 15] ~ the 25th percentile
    for col, lo, hi in (("user_id", 0, 3), ("value", 0.0, 15.0)):
        z_frac = _hit_fraction(zs, col, lo, hi)
        h_frac = _hit_fraction(hs, col, lo, hi)
        assert z_frac < 0.7, (col, z_frac)
        assert h_frac > 0.9, (col, h_frac)  # hash layout never skips
        assert z_frac < h_frac
    # the single-sorted control shows why z-order earns its shuffle: it
    # cannot skip on the non-leading column
    assert _hit_fraction(ss, "value", 0.0, 15.0) > 0.9
    assert _hit_fraction(zs, "value", 0.0, 15.0) < 0.7


def test_zorder_supports_timestamp_dimensions(spark, tmp_path):
    """Clustering by (ts, user_id) — the bread-and-butter layout for
    time-series + entity queries: both dimensions must skip files."""
    from fluent_plugin_sql_spark.sinks.lake import write_zordered

    e = load_table(spark, SF, "events").select("event_id", "ts", "user_id")
    zpath = str(tmp_path / "zt")
    write_zordered(e, zpath, ["ts", "user_id"], num_files=16, bits_per_col=4)
    assert spark.read.parquet(zpath).count() == e.count()
    stats = _file_stats(zpath, ["user_id"])
    assert _hit_fraction(stats, "user_id", 0, 3) < 0.7
    # ts stats come back as datetimes; check a ~quarter range by mass
    import glob

    import pyarrow.parquet as pq

    lo = dt.datetime(2024, 1, 1)
    hi = dt.datetime(2024, 1, 8)
    hits = total = 0
    for f in sorted(glob.glob(f"{zpath}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mn = mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names["ts"]).statistics
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        total += 1
        if not (mx.replace(tzinfo=None) < lo or mn.replace(tzinfo=None) > hi):
            hits += 1
    assert hits / total < 0.7, (hits, total)


def test_write_training_shards_balanced_deterministic(spark, tmp_path):
    """Shard export: stable hash assignment (re-export identical), one
    file per shard, in-file id order, token mass balanced, manifest
    counts exact."""
    import glob
    import json

    from fluent_plugin_sql_spark.io import load_table
    from fluent_plugin_sql_spark.sinks.lake import write_training_shards

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "shards")
    m1 = write_training_shards(docs, path, num_shards=8)

    # manifest totals are exact
    total_docs = sum(s["n_docs"] for s in m1["shards"].values())
    assert total_docs == docs.count()
    disk_manifest = json.loads(open(f"{path}/_manifest.json").read())
    assert disk_manifest == m1

    # one data file per shard, rows sorted by id within it
    import os

    for shard, st in m1["shards"].items():
        files = [
            f
            for f in glob.glob(f"{path}/shard={shard}/*")
            if not os.path.basename(f).startswith(("_", "."))
        ]
        if st["n_docs"] == 0:
            assert files == [], shard  # empty shard: manifest records it
            continue
        assert len(files) == 1, shard
        ids = [r["doc_id"] for r in spark.read.parquet(files[0]).collect()]
        assert ids == sorted(ids)

    # token balance: no shard more than 2.5x the mean (law of large
    # numbers at 500 docs / 8 shards)
    tokens = [s["n_tokens"] for s in m1["shards"].values()]
    assert max(tokens) < 2.5 * (sum(tokens) / len(tokens))

    # determinism: re-export produces the identical manifest
    m2 = write_training_shards(docs, str(tmp_path / "shards2"), num_shards=8)
    assert m2 == m1
