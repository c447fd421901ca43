"""Registry-wide dirty-data sweep (VERDICT r7 #6): every registered
query must SURVIVE an adversarial corpus — NULL keys, empty strings and
arrays, zero-norm vectors, NaN/Inf, extreme timestamps — without
raising.  The round-7 job-killer (one zero-norm embedding →
DIVIDE_BY_ZERO) is exactly this class of bug; the codec surface already
has a fuzzed never-raise contract, this extends it to the SQL surface.

Wrong-but-deterministic results on garbage rows are acceptable; an
exception that would kill a 1000-executor job is not.
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from fluent_plugin_sql_spark.io import load_table

SF_SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

_TS_MIN = datetime.datetime(1, 1, 2, 0, 0, 0)
_TS_MAX = datetime.datetime(2200, 12, 31, 23, 59, 59)


def _adversarial_values(dt, sample):
    """Four dirty values (null-ish / empty-or-zero / high extreme /
    low-negative extreme) for a type."""
    if isinstance(dt, StringType):
        return [None, "", "\N{UNICORN FACE} " + "x" * 2000, "\t\n  \r "]
    if isinstance(dt, (LongType, IntegerType)):
        hi = 2**31 - 1 if isinstance(dt, IntegerType) else 2**63 - 1
        return [None, 0, hi, -hi - 1]
    if isinstance(dt, (DoubleType, FloatType)):
        return [None, 0.0, float("nan"), float("-inf")]
    if isinstance(dt, (TimestampNTZType, TimestampType)):
        return [None, _TS_MIN, _TS_MAX, datetime.datetime(1969, 12, 31, 23, 59, 59)]
    if isinstance(dt, DateType):
        return [
            None,
            datetime.date(1, 1, 2),
            datetime.date(2200, 12, 31),
            datetime.date(1969, 12, 31),
        ]
    if isinstance(dt, BooleanType):
        return [None, False, True, None]
    if isinstance(dt, BinaryType):
        return [None, b"", b"\x00\xff" * 64, b"\xff" * 16]
    if isinstance(dt, ArrayType):
        dim = len(sample) if sample is not None else 4
        if isinstance(dt.elementType, (FloatType, DoubleType)):
            # zero-norm, and a ragged shorter vector with an Inf element
            return [None, [], [0.0] * dim, [float("inf")] * max(1, dim // 2)]
        return [None, [], None, None]
    return [None, None, None, None]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("dirty_sf")
    for t in TABLES:
        df = load_table(spark, SF_SRC, t)
        base = df.limit(30)
        sample_row = base.first()
        cols = []
        for i in range(4):
            row = []
            for f in df.schema.fields:
                sample = sample_row[f.name] if sample_row is not None else None
                row.append(_adversarial_values(f.dataType, sample)[i])
            cols.append(tuple(row))
        dirty = spark.createDataFrame(cols, df.schema)
        base.unionByName(dirty).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/{t}.parquet"
        )
    return str(d)


def test_all_registered_queries_survive_dirty_corpus(spark, dirty_dir):
    import __spark_entry__ as entry_mod

    failures = []
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            rows = fn(spark, dirty_dir).collect()
            assert rows is not None
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append((name, type(ex).__name__, str(ex).split("\n")[0][:160]))
    assert not failures, "\n".join(map(str, failures))


def test_pipeline_survives_dirty_events_end_to_end(spark, dirty_dir, tmp_path):
    """The reference's core path (poll → inject time/tag → route → sink)
    over the adversarial events table: NULL ids/timestamps/strings, NaN
    values and extreme rows must flow through run_once without raising —
    dirty-time rows quarantine, nothing kills the loop."""
    from fluent_plugin_sql_spark.pipeline import Pipeline

    cfg = {
        "source": {
            "path": dirty_dir,
            "tag_prefix": "db",
            "select_limit": 50,
            "state_file": str(tmp_path / "dirty_state.json"),
            "quarantine_time_fallback": True,
            "tables": [
                {"table": "events", "update_column": "event_id", "time_column": "ts"}
            ],
        },
        "sink": {
            "path": str(tmp_path / "dirty_out"),
            "remove_tag_prefix": "db",
            "tables": [
                {"table": "quarantined", "pattern": "**.quarantine"},
                {"table": "clean_events", "pattern": "events"},
                {"table": "catch_all"},
            ],
        },
        "logical_now": "2024-06-01 00:00:00",
    }
    pipe = Pipeline(spark, cfg)
    got = pipe.run_once(drain=True)
    # NULL-update-column rows are invisible to the strict > scan; the
    # 30 base rows + non-null dirty rows must all arrive somewhere
    assert got["events"] >= 30
    out = tmp_path / "dirty_out"
    clean = spark.read.parquet(str(out / "clean_events"))
    n_q = (
        spark.read.parquet(str(out / "quarantined")).count()
        if (out / "quarantined").exists()
        else 0
    )
    assert clean.count() + n_q == got["events"]
    # the quarantine route exists because the dirty NULL-ts row fired it
    assert n_q >= 1


def test_near_dedup_stream_survives_dirty_batches(spark, tmp_path):
    """Streaming near-dedup over micro-batches carrying NULL text, NULL
    ids, empty and whitespace-only docs: the store probe/absorb cycle
    must not raise, clean novel docs still flow, and the stream
    converges — the streaming face of the registry-wide sweep."""
    from pyspark.sql import types as T

    from fluent_plugin_sql_spark.operators.dedup import MinHashDedupStore
    from fluent_plugin_sql_spark.streaming.stream import (
        near_dedup_stream,
        stream_from_parquet_dir,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    clean = (
        "substantive document content with enough distinct tokens to "
        "shingle and sign through the minhash pipeline end to end"
    )
    src = tmp_path / "dsrc"
    src.mkdir()
    spark.createDataFrame(
        [(1, clean), (2, None), (None, "orphan row with null id")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(3, ""), (4, " \t\n "), (5, clean + " almost"), (6, None)], schema
    ).coalesce(1).write.parquet(str(src / "f2"))

    store = MinHashDedupStore(spark, str(tmp_path / "dstore"), sig_match_frac=0.5)
    out_dir = str(tmp_path / "dout")

    def sink(df, epoch_id):
        df.write.mode("append").parquet(out_dir)

    stream = stream_from_parquet_dir(
        spark, f"{src}/*/", schema, max_files_per_trigger=1
    )
    q = near_dedup_stream(
        stream, store, "text", "doc_id", sink, str(tmp_path / "dckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # doc 1 is novel and survives; doc 5 (near-copy of 1) is dropped;
    # the dirty rows neither crash the stream nor block later batches
    assert 1 in got and 5 not in got


def test_curation_job_survives_dirty_documents(spark, dirty_dir, tmp_path):
    """The config-driven batch curation pipeline (quality → exact dedup →
    near dedup → span removal → export) over the adversarial documents
    table: NULL ids/texts, empty and whitespace docs, extreme ids must
    flow through every step without raising, and the survivors must be
    writable as shards."""
    import json

    from fluent_plugin_sql_spark.curation import run_curation

    cfg = {
        "input": {"path": dirty_dir, "table": "documents"},
        "steps": [
            {"quality_filter": {"min_tokens": 3, "min_ttr": 0.3}},
            {"exact_dedup": {}},
            {"near_dedup": {"threshold": 0.8}},
            {"span_removal": {"n": 8}},
        ],
        "output": {"path": str(tmp_path / "dirty_curated"), "shards": 2},
    }
    report = run_curation(spark, cfg)
    assert report["input_rows"] == 34  # 30 base + 4 adversarial
    # every step ran; rows never increase across steps
    counts = [s["rows_after"] for s in report["steps"]]
    assert len(counts) == 4 and counts == sorted(counts, reverse=True)
    # NULL/empty/whitespace text fails the quality gate (some dirty rows
    # may legitimately pass — surviving is the contract, not rejection)
    assert counts[0] < 34
    out = spark.read.parquet(str(tmp_path / "dirty_curated"))
    manifest = json.loads(
        open(str(tmp_path / "dirty_curated" / "_manifest.json")).read()
    )
    assert out.count() == sum(s["n_docs"] for s in manifest["shards"].values())
