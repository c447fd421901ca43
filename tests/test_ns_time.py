"""Nanosecond event-time resolution (SURVEY §1.3 / VERDICT r7 missing #4).

fluentd EventTime is nanosecond-resolution (reference ChangeLog:21);
Spark's TimestampType is µs.  The engine's answer is ``load_table(...,
keep_ns=True)``: every timestamp column gains an exact int64 ``c_ns``
twin, and the generic ``IncrementalScan`` watermark runs on it — strict
``>`` on int64 is exact, so sub-µs ties neither re-emit nor skip.

These tests synthesize a true TIMESTAMP(NANOS) parquet (the driver
tables are µs-physical) with two rows in the SAME microsecond but
different nanoseconds — the case a µs watermark provably cannot
distinguish — and prove the ns path handles it exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fluent_plugin_sql_spark.io import load_table
from fluent_plugin_sql_spark.sources.incremental import IncrementalScan

BASE = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z in ns

# rows 1 and 2 share the µs 1704067200000000001000; ns differs
NS_VALUES = [
    BASE + 500,              # id 0: sub-µs fraction, truncates to BASE µs
    BASE + 1_000,            # id 1: exactly 1 µs
    BASE + 1_999,            # id 2: same µs as id 1, 999 ns later
    BASE + 2_000_000,        # id 3: 2 ms
]


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nsdata")
    table = pa.table(
        {
            "event_id": pa.array(range(len(NS_VALUES)), pa.int64()),
            "ts": pa.array(NS_VALUES, pa.timestamp("ns")),
            "kind": pa.array(["a", "b", "c", "d"]),
        }
    )
    pq.write_table(table, str(d / "nsevents.parquet"))
    return str(d)


def test_keep_ns_exposes_exact_int64(spark, ns_dir):
    df = load_table(spark, ns_dir, "nsevents", keep_ns=True)
    rows = {r["event_id"]: r for r in df.collect()}
    assert [rows[i]["ts_ns"] for i in range(4)] == NS_VALUES
    # the µs TimestampType twin truncates (floor), matching DuckDB
    micros = [rows[i]["ts"] for i in range(4)]
    assert micros[1] == micros[2]  # ns distinction lost at µs
    assert rows[0]["ts"].microsecond == 0  # 500 ns floors to 0 µs


def test_keep_ns_on_us_physical_table(spark):
    df = load_table(spark, "/root/testdata/sf0.001", "events", keep_ns=True)
    import pyspark.sql.functions as F

    bad = df.where(
        F.unix_micros(F.col("ts").cast("timestamp")) * 1000 != F.col("ts_ns")
    ).count()
    assert bad == 0 and "ts_ns" in df.columns


def test_ns_watermark_splits_sub_us_tie_exactly(spark, ns_dir):
    """A batch boundary lands BETWEEN two rows of the same microsecond:
    the ns watermark resumes with the later-ns row only — no re-emit,
    no skip.  (A µs watermark either re-reads id 1 or loses id 2.)"""
    scan = IncrementalScan(
        lambda: load_table(spark, ns_dir, "nsevents", keep_ns=True),
        update_column="ts_ns",
        select_limit=2,
    )
    first = scan.batch_plan(None).select("event_id", "ts_ns").collect()
    assert [r["event_id"] for r in first] == [0, 1]
    watermark = first[-1]["ts_ns"]
    assert watermark == BASE + 1_000
    second = scan.batch_plan(watermark).select("event_id", "ts_ns").collect()
    assert [r["event_id"] for r in second] == [2, 3]


def test_us_watermark_cannot_split_the_tie(spark, ns_dir):
    """Contrast case documenting WHY ns matters: the same scan on the
    truncated µs column skips the 999-ns-later row on resume."""
    import pyspark.sql.functions as F

    scan = IncrementalScan(
        lambda: load_table(spark, ns_dir, "nsevents", keep_ns=True).withColumn(
            "ts_us", F.unix_micros("ts")
        ),
        update_column="ts_us",
        select_limit=2,
    )
    first = scan.batch_plan(None).select("event_id", "ts_us").collect()
    watermark = first[-1]["ts_us"]
    second = scan.batch_plan(watermark).select("event_id").collect()
    # id 2 (same µs, later ns) is silently skipped by the µs watermark
    assert [r["event_id"] for r in second] == [3]


def test_ns_checkpoint_roundtrips_json_exactly(tmp_path, spark, ns_dir):
    """State persistence is exact for int64 ns values (JSON ints are
    arbitrary precision; no float path anywhere)."""
    from fluent_plugin_sql_spark.state import StateStore

    st = StateStore(str(tmp_path / "state.json"))
    st.update("nsevents", {"ts_ns": NS_VALUES[2]})
    st2 = StateStore(str(tmp_path / "state.json"))
    got = st2.last_record("nsevents")["ts_ns"]
    assert got == NS_VALUES[2] and isinstance(got, int)
