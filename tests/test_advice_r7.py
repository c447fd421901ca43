"""Round-7 ADVICE regression tests — each fix from the round-6 advisor
report gets a test that fails on the pre-fix behavior:

1. wav_pcm16_samples / audio_rms_windows: NULL payload rows skip in
   non-strict mode instead of crashing the job with a TypeError.
2. dup_clusters_star: exhausting max_rounds without signature fixpoint
   raises instead of silently returning partially-contracted labels.
3. RollupStore.regroup: a coarser window that is not a multiple of the
   stored grain raises instead of silently mis-bucketing partials.
4. stream_asof_join: a non-integral left_id column raises up front
   instead of silently NULLing the id in every emitted row.
5. write_training_shards: a pre-existing 'shard' column raises instead
   of being silently overwritten in the export.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_audio_null_payload_skips_in_nonstrict_mode(spark):
    from fluent_plugin_sql_spark.operators.multimodal import (
        audio_rms_windows,
        parse_wav_header,
        wav_pcm16_samples,
    )

    # unit level: None and sub-preamble fragments are "not a WAV"
    assert wav_pcm16_samples(None) is None
    assert wav_pcm16_samples(b"RIFF") is None
    assert parse_wav_header(None) is None
    assert parse_wav_header(b"RI") is None

    # job level: the NULL row skips, the valid row still decodes
    import io
    import wave as wavmod

    import numpy as np

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(np.full(64, 100, dtype="<i2").tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, None)],
        "doc_id long, payload binary",
    )
    out = audio_rms_windows(df, n_windows=1, strict=False).collect()
    assert [(r["doc_id"], r["rms"]) for r in out] == [(1, 100.0)]


def test_dup_clusters_star_raises_on_round_exhaustion(spark):
    from fluent_plugin_sql_spark.operators.dedup import dup_clusters_star

    # a 6-node chain cannot reach the edge-set fixpoint in zero rounds;
    # pre-fix this silently returned labels off the uncontracted edges
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not stabilize"):
        dup_clusters_star(pairs, max_rounds=0)
    # sanity: enough rounds still converges to one component
    got = {
        r["cluster_id"]
        for r in dup_clusters_star(pairs, max_rounds=16).collect()
    }
    assert got == {0}


def test_regroup_rejects_non_multiple_window(spark, tmp_path):
    from fluent_plugin_sql_spark.operators.rollup import RollupStore

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    store = RollupStore(
        spark,
        str(tmp_path / "rollup"),
        "ts",
        "1 hour",
        dims=("event_type",),
        sum_cols=("value",),
    )
    store.absorb(ev, "b0")
    with pytest.raises(ValueError, match="not a.*multiple of the stored grain"):
        store.regroup(window="90 minutes")
    # multiples still work (2 hours over an hourly store)
    assert store.regroup(window="2 hours").count() > 0


def test_stream_asof_join_rejects_string_left_id(spark):
    from fluent_plugin_sql_spark.streaming.stateful import stream_asof_join

    left = spark.createDataFrame(
        [], "user_id long, purchase_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [], "user_id long, ts timestamp, value double"
    )
    with pytest.raises(TypeError, match="integral id"):
        stream_asof_join(
            left, right, key="user_id", left_id="purchase_id"
        )


def test_training_shards_reject_existing_shard_column(spark, tmp_path):
    from fluent_plugin_sql_spark.sinks.lake import write_training_shards

    df = spark.createDataFrame(
        [(1, "some text", 9)], "doc_id long, text string, shard int"
    )
    with pytest.raises(ValueError, match="already has a 'shard' column"):
        write_training_shards(df, str(tmp_path / "shards"), num_shards=2)
