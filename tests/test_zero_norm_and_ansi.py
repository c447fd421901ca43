"""Round-8 regression tests: zero-norm embeddings must never kill a job
(the r7 verdict's reproduced DIVIDE_BY_ZERO bug), and ANSI mode is a
pinned, session-independent engine choice.

A single all-zero embedding in a 100 TB corpus is a certainty, not an
edge case: cosine() must degrade to "matches nothing" (NULL score →
dropped), never to a job-killing error, in every ANN and embedding-dedup
path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

VEC_SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>"


def _corpus(spark, with_zero=True):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
        (5, [0.0, 0.6, 0.8, 0.0]),
        (6, [0.5, 0.5, 0.5, 0.5]),
    ]
    if with_zero:
        rows.append((99, [0.0, 0.0, 0.0, 0.0]))
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_cosine_zero_norm_is_null_not_error(spark):
    from fluent_plugin_sql_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 1.0], [0.0, 0.0]),
         ([0.0, 0.0], [0.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
    )
    # explicitly under ANSI mode (the engine's pinned choice)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    out = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert [r["c"] for r in out[:3]] == [None, None, None]
    assert out[3]["c"] == pytest.approx(1.0)


def test_brute_force_topk_survives_zero_vectors(spark):
    from fluent_plugin_sql_spark.operators.similarity import brute_force_topk

    c = _corpus(spark)
    # query set includes the zero vector itself
    out = brute_force_topk(c, c, k=3).collect()
    # the zero corpus vector is never a match and never produces query rows
    assert all(r["match_id"] != 99 for r in out)
    assert all(r["query_id"] != 99 for r in out)
    assert all(r["cos"] is not None for r in out)
    # non-zero results are identical to a corpus without the zero vector
    clean = brute_force_topk(_corpus(spark, with_zero=False), _corpus(spark, with_zero=False), k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, out)) == sorted(map(tuple, clean))


def test_lsh_and_ivf_topk_survive_zero_vectors(spark):
    from fluent_plugin_sql_spark.operators.similarity import ivf_topk, lsh_topk

    c = _corpus(spark)
    lsh = lsh_topk(c, c, k=3, num_planes=2, num_tables=4, dim=4).collect()
    ivf = ivf_topk(c, c, k=3, num_centroids=3, nprobe=2).collect()
    for rows in (lsh, ivf):
        assert all(r["cos"] is not None for r in rows)
        assert all(r["match_id"] != 99 for r in rows)
        assert all(r["query_id"] != 99 for r in rows)


def test_ivf_index_build_and_search_survive_zero_vectors(spark, tmp_path):
    from fluent_plugin_sql_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_from_index,
    )

    c = _corpus(spark)
    idx = str(tmp_path / "ivf_zero")
    build_ivf_index(c, idx, num_centroids=3)
    out = ivf_topk_from_index(spark, idx, c, k=3, nprobe=2).collect()
    assert all(r["cos"] is not None for r in out)
    assert all(r["match_id"] != 99 for r in out)


def test_embedding_dedup_store_survives_zero_vectors(spark, tmp_path):
    from fluent_plugin_sql_spark.operators.dedup import EmbeddingDedupStore

    path = str(tmp_path / "estore_zero")
    store = EmbeddingDedupStore(spark, path, threshold=0.9, num_centroids=2, nprobe=2)
    b1 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (99, [0.0, 0.0, 0.0, 0.0])], VEC_SCHEMA
    )
    s1 = store.process_batch(b1, "embedding", "vec_id")
    # zero vector matches nothing (NULL score) → it is novel, it survives
    assert {r["vec_id"] for r in s1.collect()} == {1, 99}

    b2 = spark.createDataFrame(
        [
            (10, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 1 → dropped
            (98, [0.0, 0.0, 0.0, 0.0]),    # another zero vector → kept
            (11, [0.0, 0.0, 1.0, 0.0]),    # novel → kept
        ],
        VEC_SCHEMA,
    )
    s2 = store.process_batch(b2, "embedding", "vec_id")
    assert {r["vec_id"] for r in s2.collect()} == {98, 11}


def test_embedding_dup_pairs_survives_zero_vectors(spark):
    from fluent_plugin_sql_spark.operators.dedup import embedding_dup_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),
            (99, [0.0, 0.0, 0.0, 0.0]),
            (98, [0.0, 0.0, 0.0, 0.0]),
        ],
        VEC_SCHEMA,
    )
    pairs = embedding_dup_pairs(df, "embedding", "vec_id", threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    # zero vectors pair with nothing, not even each other (0/0 → sim 0)
    assert all(99 not in p and 98 not in p for p in got)


def test_jaccard_zero_shingle_docs_do_not_raise(spark):
    from fluent_plugin_sql_spark.operators.dedup import jaccard_dup_pairs

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog!"),
         (3, ""), (4, ""), (5, "ab")],  # empty / sub-k texts → 0 shingles
        "doc_id LONG, text STRING",
    )
    spark.conf.set("spark.sql.ansi.enabled", "true")
    pairs = jaccard_dup_pairs(df, "text", "doc_id", threshold=0.5, k=3).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p and 5 not in p for p in got)


def test_factory_session_pins_ansi_on(spark):
    """The engine's documented choice: strict ANSI everywhere; dirty
    data is handled at explicit try_* sites, not by permissive mode."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(Exception):
        spark.sql("SELECT 1/0 AS x").collect()
    assert spark.sql("SELECT try_divide(1, 0) AS x").collect()[0]["x"] is None


def test_registry_pin_makes_sessions_behave_identically(spark):
    """A registry query run on a hostile session (ANSI off, non-UTC tz)
    must return exactly what it returns on the factory session — the
    wrapper pins both confs on whatever session it is handed."""
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()["q1_pricing_summary"]
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.ansi.enabled", "false")
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")

    a = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, fn(hostile, "/root/testdata/sf0.001").collect()))
    assert a == b
    # the pin is visible on the hostile session afterwards
    assert hostile.conf.get("spark.sql.ansi.enabled") == "true"
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
