"""Config-driven batch curation job (curation.run_curation): the
one-config corpus pipeline composing quality gate, dedup families, span
removal, sampling, and shard export end-to-end."""

from __future__ import annotations

import json

from fluent_plugin_sql_spark.curation import run_curation


def test_curation_job_end_to_end(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from every hunter")
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token span
    rows = [
        (1, base),
        (2, base),                                    # exact dup of 1
        (3, base.replace("green", "dark")),           # near dup of 1
        (4, f"completely different content {shared} about spark shuffles "
            "partitions and broadcast joins at terabyte scale today"),
        (5, f"another unrelated document {shared} mentioning watermarks "
            "streaming state stores checkpoints and exactly once sinks"),
        (6, "too short"),                             # quality reject
        (7, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    ]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(1) \
        .write.parquet(str(src / "documents.parquet"))

    cfg = {
        "input": {"path": str(src), "table": "documents"},
        "steps": [
            {"quality_filter": {"min_tokens": 5, "min_ttr": 0.5}},
            {"exact_dedup": {}},
            {"near_dedup": {"threshold": 0.7}},
            {"span_removal": {"n": 8}},
        ],
        "output": {"path": str(tmp_path / "out"), "shards": 2},
    }
    report = run_curation(spark, cfg)

    assert report["input_rows"] == 7
    by_step = {s["step"]: s["rows_after"] for s in report["steps"]}
    assert by_step["quality_filter"] == 5      # 6 too short, 7 zero-TTR
    assert by_step["exact_dedup"] == 4         # 2 is a copy of 1
    assert by_step["near_dedup"] == 3          # 3 is a near copy of 1 (J~0.76)
    assert by_step["span_removal"] == 3

    out = spark.read.parquet(str(tmp_path / "out"))
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 4, 5}
    # the shared 8-token span was removed from BOTH its carriers
    for d in (4, 5):
        assert "alpha" not in got[d] and "theta" not in got[d]
    assert got[1] == base  # untouched doc keeps its text

    # manifest written and consistent
    manifest = json.loads(open(str(tmp_path / "out" / "_manifest.json")).read())
    assert sum(s["n_docs"] for s in manifest["shards"].values()) == 3


def test_curation_semantic_dedup_step(spark, tmp_path):
    """SemDeDup as a curation step: near-identical embeddings prune
    keep-first; docs WITHOUT a valid embedding are kept (dedup cannot
    judge them)."""
    import numpy as np

    dim = 8
    base = list(np.eye(dim)[0] * 10)
    other = list(np.eye(dim)[1] * 10)
    docs = [(i, f"document number {i} with enough words to pass") for i in
            range(1, 7)]
    embs = [
        (1, [float(x) for x in base]),
        (2, [float(x * 1.01) for x in base]),   # cos=1 with 1 -> pruned
        (3, [float(x) for x in other]),
        (4, [float(x * 0.98) for x in other]),  # cos=1 with 3 -> pruned
        (5, None),                              # no embedding -> kept
        # doc 6 has NO embeddings row at all -> kept
    ]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(docs, "doc_id LONG, text STRING").coalesce(1) \
        .write.parquet(str(src / "documents.parquet"))
    spark.createDataFrame(embs, f"vec_id LONG, embedding ARRAY<DOUBLE>") \
        .coalesce(1).write.parquet(str(src / "embeddings.parquet"))

    cfg = {
        "input": {"path": str(src), "table": "documents"},
        "steps": [
            {"semantic_dedup": {"k": 2, "tau": 0.9, "dim": dim,
                                "init": "farthest"}},
        ],
    }
    report = run_curation(spark, cfg)
    assert report["input_rows"] == 6
    assert report["steps"][0]["rows_after"] == 4  # 2 and 4 pruned
