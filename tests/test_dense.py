"""Vectorized (numpy GEMM) dense-math path vs the fold path: the
contract is IDENTICAL results on the gate corpora and on dirty data —
the ulp-tolerance class (a true value within an ulp of a rounding/tie
boundary) is documented but must not show up on any test corpus.

Covers: brute-force top-k, k-means assignment/centroids, SemDeDup
pruning; dirty-data semantics (NULL/wrong-dim drop, zero-norm NULL
cosine, NaN ranks first / NaN >= tau prunes, dup ids); string ids;
mixed-dim query groups; empty edges.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.cluster import (
    kmeans_centroids,
    kmeans_embeddings,
    semdedup_prune,
)
from fluent_plugin_sql_spark.operators.similarity import brute_force_topk

from conftest import SF_DIR_001


def _emb(spark, sf_dir=SF_DIR_001):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestGateCorpusParity:
    def test_bruteforce_topk_identical(self, spark):
        emb = _emb(spark)
        q = emb.where(F.col("vec_id") < 10)
        fold = _rows(brute_force_topk(emb, q, k=5))
        vec = _rows(brute_force_topk(emb, q, k=5, numeric_mode="vectorized"))
        assert fold == vec
        assert len(fold) == 50

    def test_kmeans_assignment_identical(self, spark):
        emb = _emb(spark)
        fold = sorted(
            (r.vec_id, r.cluster, round(r.dist, 4))
            for r in kmeans_embeddings(emb, k=8, iters=2, dim=64).collect()
        )
        vec = sorted(
            (r.vec_id, r.cluster, round(r.dist, 4))
            for r in kmeans_embeddings(
                emb, k=8, iters=2, dim=64, numeric_mode="vectorized"
            ).collect()
        )
        assert fold == vec

    def test_kmeans_centroids_identical_on_grid(self, spark):
        emb = _emb(spark)
        fold = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_centroids(emb, k=4, iters=2, dim=64).collect()
        )
        vec = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_centroids(
                emb, k=4, iters=2, dim=64, numeric_mode="vectorized"
            ).collect()
        )
        # centroids are rounded to the 1e-6 grid in BOTH modes — the
        # grid collapses the GEMM-vs-fold summation-order ulps
        assert fold == vec

    def test_semdedup_identical(self, spark):
        emb = _emb(spark)
        fold = _rows(semdedup_prune(emb, k=8, dim=64, tau=0.8))
        vec = _rows(
            semdedup_prune(
                emb, k=8, dim=64, tau=0.8, numeric_mode="vectorized"
            )
        )
        assert fold == vec


_DIRTY = [
    (1, [1.0, 2.0, 3.0, 4.0]),
    (1, [4.0, 3.0, 2.0, 1.0]),  # dup id, different vector
    (2, [0.0, 0.0, 0.0, 0.0]),  # zero norm
    (3, [float("nan"), 1.0, 1.0, 1.0]),  # NaN coordinate
    (4, None),  # NULL vector
    (None, [1.0, 1.0, 1.0, 1.0]),  # NULL id
    (5, [1.0, 2.0]),  # wrong dim
    (6, [2.0, 2.0, 2.0, 2.0]),
    (7, [1.0, 2.0, 3.0, 4.5]),
    (8, [-1.0, -2.0, -3.0, -4.0]),
    (9, [float("inf"), 1.0, 0.0, 0.0]),  # Inf coordinate
    (10, [0.5, 0.25, 0.125, 0.0625]),
    (11, []),  # zero-length vector (zero norm, dim-0 query group)
]


def _dirty_df(spark):
    return spark.createDataFrame(
        _DIRTY, "vec_id long, embedding array<double>"
    )


def _nan_safe(t):
    return tuple(
        "NaN" if isinstance(x, float) and math.isnan(x) else x for x in t
    )


class TestDirtyCorpusParity:
    def test_bruteforce_dirty(self, spark):
        e = _dirty_df(spark)
        q = e.where(F.col("vec_id") < 4)
        fold = sorted(
            _nan_safe(t) for t in map(tuple, brute_force_topk(e, q, k=3).collect())
        )
        vec = sorted(
            _nan_safe(t)
            for t in map(
                tuple,
                brute_force_topk(
                    e, q, k=3, numeric_mode="vectorized"
                ).collect(),
            )
        )
        assert fold == vec
        # NaN-vector corpus rows must be present (NaN ranks first);
        # zero-norm corpus rows never match a FINITE query (NULL cos
        # dropped) — they can still meet the NaN query (NaN denom)
        assert any(t[1] == 3 for t in fold)
        assert not any(t[0] == 1 and t[1] == 2 for t in fold)

    def test_kmeans_dirty(self, spark):
        e = _dirty_df(spark)
        fold = sorted(
            _nan_safe((r.vec_id, r.cluster, round(r.dist, 4)))
            for r in kmeans_embeddings(e, k=3, iters=2, dim=4).collect()
        )
        vec = sorted(
            _nan_safe((r.vec_id, r.cluster, round(r.dist, 4)))
            for r in kmeans_embeddings(
                e, k=3, iters=2, dim=4, numeric_mode="vectorized"
            ).collect()
        )
        assert fold == vec
        # dup id collapsed to one row; NULL id/vec and wrong-dim
        # dropped: 12 input rows → 9 valid → 8 distinct ids
        assert len(fold) == 8

    def test_semdedup_dirty(self, spark):
        e = _dirty_df(spark)
        fold = _rows(semdedup_prune(e, k=2, dim=4, tau=0.7))
        vec = _rows(
            semdedup_prune(
                e, k=2, dim=4, tau=0.7, numeric_mode="vectorized"
            )
        )
        assert fold == vec

    def test_semdedup_dirty_unguarded_and_flat_cap(self, spark):
        e = _dirty_df(spark)
        for cap in (None, 2):
            fold = _rows(
                semdedup_prune(e, k=2, dim=4, tau=0.7, max_cluster_size=cap)
            )
            vec = _rows(
                semdedup_prune(
                    e,
                    k=2,
                    dim=4,
                    tau=0.7,
                    max_cluster_size=cap,
                    numeric_mode="vectorized",
                )
            )
            assert fold == vec


class TestLargeKVectorized:
    """The large-k machinery (k-means|| weighting + two-level
    assignment) through the GEMM path — fold-identical on the gate
    corpus, dirty corpora, and string ids."""

    def test_parallel_centroids_identical(self, spark):
        from fluent_plugin_sql_spark.operators.cluster import (
            kmeans_parallel_centroids,
        )

        emb = _emb(spark)
        fold = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                emb, k=4, dim=64, l=6, rounds=2, refine_iters=2
            ).collect()
        )
        vec = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                emb, k=4, dim=64, l=6, rounds=2, refine_iters=2,
                numeric_mode="vectorized",
            ).collect()
        )
        assert fold == vec

    def test_two_level_assign_identical(self, spark):
        from fluent_plugin_sql_spark.operators.cluster import (
            assign_two_level, kmeans_parallel_centroids,
        )

        emb = _emb(spark)
        cents = kmeans_parallel_centroids(
            emb, k=6, dim=64, l=8, rounds=2, refine_iters=2
        ).localCheckpoint(eager=True)
        fold = sorted(
            (r.vec_id, r.cluster, round(r.dist, 4))
            for r in assign_two_level(
                emb, cents, dim=64, coarse_k=3, nprobe=2
            ).collect()
        )
        vec = sorted(
            (r.vec_id, r.cluster, round(r.dist, 4))
            for r in assign_two_level(
                emb, cents, dim=64, coarse_k=3, nprobe=2,
                numeric_mode="vectorized",
            ).collect()
        )
        assert fold == vec

    def test_large_composed_dirty_parity(self, spark):
        from fluent_plugin_sql_spark.operators.cluster import (
            kmeans_large_embeddings,
        )

        e = _dirty_df(spark)
        fold = sorted(
            _nan_safe((r.vec_id, r.cluster, round(r.dist, 4)))
            for r in kmeans_large_embeddings(
                e, k=3, dim=4, l=4, rounds=2, nprobe=2
            ).collect()
        )
        vec = sorted(
            _nan_safe((r.vec_id, r.cluster, round(r.dist, 4)))
            for r in kmeans_large_embeddings(
                e, k=3, dim=4, l=4, rounds=2, nprobe=2,
                numeric_mode="vectorized",
            ).collect()
        )
        assert fold == vec

    def test_ivf_index_vectorized_training_identical(self, spark, tmp_path):
        from fluent_plugin_sql_spark.operators.similarity import (
            build_ivf_index, ivf_topk_from_index,
        )

        emb = _emb(spark)
        q = emb.where(F.col("vec_id") < 8)
        outs = []
        for mode, sub in (("fold", "a"), ("vectorized", "b")):
            p = str(tmp_path / sub)
            build_ivf_index(
                emb, p, num_centroids=8, centroid_mode="kmeans",
                dim=64, numeric_mode=mode,
            )
            outs.append(_rows(ivf_topk_from_index(spark, p, q, k=5)))
            cents = sorted(
                map(tuple, spark.read.parquet(f"{p}/centroids").collect())
            )
            outs.append(cents)
        assert outs[0] == outs[2]  # identical search results
        assert outs[1] == outs[3]  # identical trained centroids

    def test_string_ids_vectorized(self, spark):
        from fluent_plugin_sql_spark.operators.cluster import (
            assign_two_level, kmeans_parallel_centroids,
        )

        rows = [
            (f"doc-{i:03d}", [float(i % 5), float(i % 3), 1.0, 0.25])
            for i in range(24)
        ]
        e = spark.createDataFrame(
            rows, "vec_id string, embedding array<double>"
        )
        cents = kmeans_parallel_centroids(
            e, k=3, dim=4, l=4, rounds=2, numeric_mode="vectorized"
        )
        assert cents.count() == 3
        out = assign_two_level(
            e, cents, dim=4, nprobe=2, numeric_mode="vectorized"
        )
        assert out.count() == 24
        assert dict(out.dtypes)["vec_id"] == "string"


class TestStringAndMixedDims:
    def test_string_ids(self, spark):
        rows = [
            (f"d{i}", [float(i % 4), float(i % 3), 1.0, 0.5])
            for i in range(20)
        ]
        e = spark.createDataFrame(
            rows, "vec_id string, embedding array<double>"
        )
        q = e.where(F.col("vec_id").isin("d0", "d1", "d2"))
        fold = _rows(brute_force_topk(e, q, k=4))
        vec = _rows(brute_force_topk(e, q, k=4, numeric_mode="vectorized"))
        assert fold == vec
        assert dict(
            brute_force_topk(e, q, k=4, numeric_mode="vectorized").dtypes
        )["match_id"] == "string"

    def test_mixed_dim_queries_score_only_matching_corpus(self, spark):
        # the fold path NULLs length-mismatched pairs — each query only
        # scores corpus rows of its own length; the vectorized path
        # groups queries by dim to replicate that exactly
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.5, 0.5]),
            (3, [1.0, 0.0, 0.0]),
            (4, [0.0, 1.0, 0.0]),
            (5, [0.25, 0.75]),
            (6, [0.1, 0.2, 0.3]),
        ]
        e = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        q = e.where(F.col("vec_id").isin(1, 3))
        fold = _rows(brute_force_topk(e, q, k=3))
        vec = _rows(brute_force_topk(e, q, k=3, numeric_mode="vectorized"))
        assert fold == vec
        by_query = {}
        for t in vec:
            by_query.setdefault(t[0], set()).add(t[1])
        assert by_query[1] <= {2, 5}  # dim-2 corpus only
        assert by_query[3] <= {4, 6}  # dim-3 corpus only

    def test_empty_queries(self, spark):
        e = _emb(spark)
        q = e.where(F.lit(False))
        out = brute_force_topk(e, q, k=5, numeric_mode="vectorized")
        assert out.count() == 0
        assert out.columns == ["query_id", "match_id", "cos", "rank"]

    def test_bad_mode_rejected(self, spark):
        e = _emb(spark)
        with pytest.raises(ValueError, match="numeric_mode"):
            brute_force_topk(e, e, k=5, numeric_mode="numpy")
        with pytest.raises(ValueError, match="numeric_mode"):
            kmeans_embeddings(e, k=2, dim=64, numeric_mode="numpy")
        with pytest.raises(ValueError, match="numeric_mode"):
            semdedup_prune(e, k=2, dim=64, numeric_mode="numpy")
