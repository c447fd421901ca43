"""Round-9 edge-parameter hardening for the k-means/SemDeDup surface
(verdict item 7): k exceeding the corpus after the validity filter,
all-identical vectors, dim mismatch between the document corpus and the
embeddings table in the curation join — all must degrade, never raise."""

from __future__ import annotations

import numpy as np
import pytest

from fluent_plugin_sql_spark.operators.cluster import (
    assign_two_level,
    kmeans_centroids,
    kmeans_embeddings,
    kmeans_parallel_centroids,
    semdedup_prune,
)

DIM = 8


@pytest.mark.usefixtures("spark")
class TestKExceedsCorpus:
    def _tiny(self, spark, n=3):
        rows = [(i, [float(i * 3 + 1)] * DIM) for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_kmeans_k_over_n(self, spark):
        out = kmeans_embeddings(self._tiny(spark), k=50, iters=2, dim=DIM)
        rows = out.collect()
        assert len(rows) == 3  # everyone assigned, nobody raises
        assert len({r.cluster for r in rows}) <= 3

    def test_kmeans_k_over_n_after_validity_filter(self, spark):
        # 10 input rows but only 2 survive the validity filter
        rows = [(0, [1.0] * DIM), (1, [5.0] * DIM)]
        rows += [(None, [2.0] * DIM)] * 4
        rows += [(10 + i, [1.0] * (DIM - 1)) for i in range(4)]  # ragged
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = kmeans_embeddings(df, k=8, iters=2, dim=DIM).collect()
        assert {r.vec_id for r in out} == {0, 1}

    def test_semdedup_k_over_n(self, spark):
        out = semdedup_prune(
            self._tiny(spark), k=20, iters=1, dim=DIM, tau=0.99
        ).collect()
        assert len(out) == 3 and all(r.keep for r in out)

    def test_parallel_k_over_n(self, spark):
        cents = kmeans_parallel_centroids(
            self._tiny(spark), k=40, dim=DIM, l=80
        )
        assert 1 <= cents.count() <= 3

    def test_two_level_coarse_over_k(self, spark):
        df = self._tiny(spark, n=5)
        cents = kmeans_centroids(df, k=2, iters=1, dim=DIM)
        out = assign_two_level(
            df, cents, dim=DIM, coarse_k=10, nprobe=5
        ).collect()
        assert len(out) == 5

    def test_two_level_single_centroid(self, spark):
        df = self._tiny(spark, n=4)
        cents = kmeans_centroids(df, k=1, iters=1, dim=DIM)
        out = assign_two_level(df, cents, dim=DIM, nprobe=1).collect()
        assert len(out) == 4 and len({r.cluster for r in out}) == 1


@pytest.mark.usefixtures("spark")
class TestAllIdenticalVectors:
    def _same(self, spark, n=30):
        return spark.createDataFrame(
            [(i, [2.5] * DIM) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    def test_kmeans_all_identical(self, spark):
        out = kmeans_embeddings(self._same(spark), k=8, iters=2, dim=DIM)
        rows = out.collect()
        assert len(rows) == 30
        # identical seeds -> argmin tie -> everyone in the min cid
        assert {r.cluster for r in rows} == {0}
        assert all(r.dist == 0.0 for r in rows)

    def test_semdedup_all_identical_keeps_one(self, spark):
        out = {
            r.vec_id: r.keep
            for r in semdedup_prune(
                self._same(spark), k=12, iters=1, dim=DIM, tau=0.9
            ).collect()
        }
        assert sum(out.values()) == 1 and out[0]

    def test_parallel_all_identical_one_centroid(self, spark):
        # every non-seed point has dmin=0 -> priority NULL -> no
        # oversampling candidates; one candidate, one seed
        cents = kmeans_parallel_centroids(
            self._same(spark), k=8, dim=DIM, l=16
        ).collect()
        assert len(cents) == 1 and cents[0].c == [2.5] * DIM

    def test_semdedup_identical_plus_zero_norm(self, spark):
        df = self._same(spark, n=5).unionByName(
            spark.createDataFrame(
                [(99, [0.0] * DIM)], "vec_id long, embedding array<double>"
            )
        )
        out = {
            r.vec_id: r.keep
            for r in semdedup_prune(df, k=2, iters=1, dim=DIM, tau=0.5)
            .collect()
        }
        assert out[99]  # zero-norm: NULL cosine, always kept
        assert sum(out[i] for i in range(5)) == 1


@pytest.mark.usefixtures("spark")
class TestCurationDimMismatch:
    def test_semantic_dedup_dim_mismatch_keeps_all_docs(
        self, spark, tmp_path
    ):
        """Configured dim disagrees with the embeddings table's actual
        dim: every embedding fails the validity filter, semantic dedup
        can judge nothing, and ALL docs must survive (dropping them
        would turn a config mismatch into silent data loss)."""
        from fluent_plugin_sql_spark.curation import run_curation

        g = np.random.default_rng(5)
        docs = [(i, "word " * 40) for i in range(20)]
        embs = [
            (i, [float(x) for x in g.normal(0, 1, 64)]) for i in range(20)
        ]
        (tmp_path / "in").mkdir()
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.parquet(str(tmp_path / "in" / "documents.parquet"))
        spark.createDataFrame(
            embs, "vec_id long, embedding array<double>"
        ).write.parquet(str(tmp_path / "in" / "embeddings.parquet"))
        cfg = {
            "input": {"path": str(tmp_path / "in"), "table": "documents"},
            "steps": [
                {"semantic_dedup": {"k": 4, "tau": 0.5, "dim": 16}},
            ],
            "output": {"path": str(tmp_path / "out"), "shards": 2},
        }
        report = run_curation(spark, cfg)
        assert report["steps"][-1]["rows_after"] == 20

    def test_semantic_dedup_matching_dim_prunes(self, spark, tmp_path):
        from fluent_plugin_sql_spark.curation import run_curation

        docs = [(i, f"doc {i} " + "word " * 40) for i in range(6)]
        base = [1.0] + [0.0] * 15
        embs = [(i, base) for i in range(3)] + [
            (i, [0.0] * 15 + [1.0]) for i in range(3, 6)
        ]
        (tmp_path / "in").mkdir()
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.parquet(str(tmp_path / "in" / "documents.parquet"))
        spark.createDataFrame(
            embs, "vec_id long, embedding array<double>"
        ).write.parquet(str(tmp_path / "in" / "embeddings.parquet"))
        cfg = {
            "input": {"path": str(tmp_path / "in"), "table": "documents"},
            "steps": [
                {"semantic_dedup": {"k": 2, "tau": 0.9, "dim": 16}},
            ],
            "output": {"path": str(tmp_path / "out"), "shards": 1},
        }
        report = run_curation(spark, cfg)
        # two identical-embedding triples -> one kept per direction
        assert report["steps"][-1]["rows_after"] == 2
