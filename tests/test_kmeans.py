"""Distributed Lloyd k-means (operators/cluster): ground-truth recovery
on separated blobs, Lloyd monotonicity, empty-cluster handling, and the
dirty-data contract.  Cross-engine replication (every assignment and
distance vs a from-scratch DuckDB re-run) is the gate queries
`kmeans_embeddings_assign` / `kmeans_cluster_profile`."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.cluster import (
    kmeans_cluster_profile,
    kmeans_embeddings,
    semdedup_prune,
)

DIM = 8


def _blobs(spark, centers, per=40, spread=0.05, seed=3):
    """Well-separated gaussian blobs; returns (df, truth: id -> blob)."""
    g = np.random.default_rng(seed)
    rows, truth = [], {}
    i = 0
    for b, c in enumerate(centers):
        for _ in range(per):
            v = (np.asarray(c, float) + g.normal(0, spread, DIM)).tolist()
            rows.append((i, [float(x) for x in v]))
            truth[i] = b
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, truth


@pytest.mark.usefixtures("spark")
class TestKmeans:
    def test_farthest_init_recovers_separated_blobs(self, spark):
        # hash init CAN seed two centroids inside one blob (Lloyd then
        # never splits the merged remainder — classic k-means); the
        # greedy k-center init lands one seed per mode by construction
        centers = [np.eye(DIM)[b] * 10 for b in range(3)]
        df, truth = _blobs(spark, centers)
        out = kmeans_embeddings(
            df, k=3, iters=3, dim=DIM, init="farthest"
        ).collect()
        assert len(out) == 3 * 40
        # label purity: every k-means cluster maps to exactly one blob
        by_cluster: dict[int, set[int]] = {}
        for r in out:
            by_cluster.setdefault(r.cluster, set()).add(truth[r.vec_id])
        assert len(by_cluster) == 3
        assert all(len(blobs) == 1 for blobs in by_cluster.values())
        # distances are to a near-blob-center point: tiny for all rows
        assert max(r.dist for r in out) < 1.0

    def test_hash_init_partitions_without_mixing_within_cluster(self, spark):
        # hash init gives no mode-recovery guarantee, but the Lloyd
        # machinery must still produce a full partition with coherent
        # distances
        centers = [np.eye(DIM)[b] * 10 for b in range(3)]
        df, _ = _blobs(spark, centers)
        out = kmeans_embeddings(df, k=3, iters=3, dim=DIM).collect()
        assert len(out) == 3 * 40
        assert 1 <= len({r.cluster for r in out}) <= 3

    def test_lloyd_iterations_do_not_increase_wcss(self, spark):
        centers = [np.eye(DIM)[b] * 4 for b in range(4)]
        df, _ = _blobs(spark, centers, per=25, spread=0.8, seed=9)
        wcss = []
        for iters in (1, 2, 3):
            a = kmeans_embeddings(df, k=4, iters=iters, dim=DIM)
            wcss.append(a.agg(F.sum("dist")).first()[0])
        # monotone non-increasing modulo the 1e-6 centroid grid
        assert wcss[1] <= wcss[0] + 1e-3
        assert wcss[2] <= wcss[1] + 1e-3

    def test_empty_cluster_keeps_centroid_no_crash(self, spark):
        # two distinct locations, k=3: at least one centroid starves
        rows = [(i, [0.0] * DIM) for i in range(10)] + [
            (i, [9.0] * DIM) for i in range(10, 20)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = kmeans_embeddings(df, k=3, iters=3, dim=DIM).collect()
        assert len(out) == 20
        assert len({r.cluster for r in out}) <= 3
        # the two point-masses end in different clusters with dist 0
        d0 = {r.cluster for r in out if r.vec_id < 10}
        d1 = {r.cluster for r in out if r.vec_id >= 10}
        assert d0 != d1 and all(r.dist == 0.0 for r in out)

    def test_dirty_inputs_filtered_never_raise(self, spark):
        rows = [
            (0, [1.0] * DIM),
            (1, [2.0] * DIM),
            (None, [3.0] * DIM),          # NULL id
            (3, None),                     # NULL vector
            (4, [1.0] * (DIM - 1)),        # ragged
            (5, [float("nan")] * DIM),     # NaN coords: kept, no raise
            (6, [float("inf")] * DIM),     # Inf coords: kept, no raise
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = kmeans_embeddings(df, k=2, iters=2, dim=DIM).collect()
        assert {r.vec_id for r in out} == {0, 1, 5, 6}

    def test_profile_partitions_the_corpus(self, spark):
        centers = [np.eye(DIM)[b] * 6 for b in range(3)]
        df, _ = _blobs(spark, centers, per=30, seed=5)
        prof = kmeans_cluster_profile(df, k=3, iters=2, dim=DIM).collect()
        assert sum(r.size for r in prof) == 90
        assert all(r.mean_dist <= r.max_dist for r in prof)

    def test_semdedup_keep_first_within_cluster(self, spark):
        # two separated modes; inside mode A, ids 0/1/2 are near-copies
        # (cos ≈ 1) and id 3 is orthogonal-ish within the mode region
        base = np.eye(DIM)[0] * 10
        rows = [
            (0, list(base)),
            (1, list(base * 1.01)),          # same direction: cos = 1
            (2, list(base * 0.97)),
            (3, list(base + np.eye(DIM)[1] * 10)),  # cos ≈ 0.707
        ] + [(10 + i, list(np.eye(DIM)[2] * 10)) for i in range(3)]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<double>",
        )
        out = {
            r.vec_id: r
            for r in semdedup_prune(
                df, k=2, iters=2, dim=DIM, tau=0.9, init="farthest"
            ).collect()
        }
        assert len(out) == 7
        # lowest id of each near-dup group survives, later copies prune
        assert out[0].keep and not out[1].keep and not out[2].keep
        assert out[3].keep  # cos ≈ 0.707 < 0.9: not a semantic dup
        assert out[10].keep and not out[11].keep and not out[12].keep

    def test_semdedup_salt_cap_identity_under_cap(self, spark):
        # every cluster at or under the cap: bit-identical decisions
        centers = [np.eye(DIM)[b] * 10 for b in range(2)]
        df, _ = _blobs(spark, centers, per=12, spread=0.3, seed=11)
        base = {
            r.vec_id: (r.cluster, r.keep)
            for r in semdedup_prune(
                df, k=2, iters=2, dim=DIM, tau=0.98, init="farthest"
            ).collect()
        }
        capped = {
            r.vec_id: (r.cluster, r.keep)
            for r in semdedup_prune(
                df, k=2, iters=2, dim=DIM, tau=0.98, init="farthest",
                max_cluster_size=50,
            ).collect()
        }
        assert base == capped

    def test_semdedup_salt_cap_bounds_mega_cluster(self, spark):
        # 60 identical vectors: unguarded keeps exactly 1; the cap
        # splits into shards, each keeping its own min id — strictly
        # fewer prunes (keep superset), never a wrong prune, global
        # min id always kept
        rows = [(i, [5.0] * DIM) for i in range(60)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        unguarded = {
            r.vec_id: r.keep
            for r in semdedup_prune(df, k=1, iters=1, dim=DIM, tau=0.9).collect()
        }
        assert sum(unguarded.values()) == 1 and unguarded[0]
        capped = {
            r.vec_id: r.keep
            for r in semdedup_prune(
                df, k=1, iters=1, dim=DIM, tau=0.9, max_cluster_size=10
            ).collect()
        }
        n_keep = sum(capped.values())
        assert capped[0]  # global min survives in its shard
        assert 1 <= n_keep <= 6  # at most one per shard
        # superset property: everything the unguarded run kept is kept
        assert all(capped[i] for i, kp in unguarded.items() if kp)

    def test_semdedup_zero_norm_always_kept(self, spark):
        rows = [(0, [1.0] * DIM), (1, [1.0] * DIM), (2, [0.0] * DIM)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = {
            r.vec_id: r.keep
            for r in semdedup_prune(df, k=1, iters=1, dim=DIM, tau=0.5).collect()
        }
        assert out == {0: True, 1: False, 2: True}

    def test_farthest_init_survives_nan_inf_vectors(self, spark):
        # NaN sorts LARGEST in Spark, so without the finite-candidate
        # filter the k-center argmax picked NaN vectors as seeds and
        # repr(nan) broke the generated SQL (AnalysisException) — a
        # never-raise-contract violation found by direct test
        rows = [
            (0, [1.0] * DIM),
            (1, [2.0] * DIM),
            (2, [float("nan")] * DIM),
            (3, [3.0] * DIM),
            (4, [float("inf")] * DIM),
            (5, [9.0] * DIM),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = kmeans_embeddings(
            df, k=3, iters=2, dim=DIM, init="farthest"
        ).collect()
        # everyone assigned (NaN/Inf rows flow IEEE), nobody raises
        assert {r.vec_id for r in out} == {0, 1, 2, 3, 4, 5}
        dec = semdedup_prune(
            df, k=2, iters=1, dim=DIM, tau=0.9, init="farthest"
        ).collect()
        assert {r.vec_id for r in dec} == {0, 1, 2, 3, 4, 5}

    def test_all_nonfinite_corpus_returns_empty_farthest(self, spark):
        df = spark.createDataFrame(
            [(0, [float("nan")] * DIM), (1, [float("inf")] * DIM)],
            "vec_id long, embedding array<double>",
        )
        out = kmeans_embeddings(
            df, k=2, iters=1, dim=DIM, init="farthest"
        ).collect()
        # no finite seed candidates -> no centroids -> empty result,
        # never an error
        assert out == []

    def test_unrounded_centroids_path(self, spark):
        centers = [np.eye(DIM)[b] * 6 for b in range(2)]
        df, _ = _blobs(spark, centers, per=15, seed=7)
        out = kmeans_embeddings(
            df, k=2, iters=2, dim=DIM, centroid_decimals=None
        ).collect()
        assert len(out) == 30


@pytest.mark.usefixtures("spark")
class TestKmeansIvf:
    """Trained-centroid IVF (build_ivf_index(centroid_mode='kmeans')):
    recall lift over the hash pick at identical nprobe, plus layout
    compatibility with the untouched search path."""

    def _corpus(self, spark, modes=12, per=40, dim=16, seed=2, noise=1.5):
        g = np.random.default_rng(seed)
        centers = g.normal(0, 6, (modes, dim))
        rows = []
        i = 0
        for m in range(modes):
            for _ in range(per):
                v = centers[m] + g.normal(0, noise, dim)
                rows.append((i, [float(x) for x in v]))
                i += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    @staticmethod
    def _recall(approx, exact):
        a = {}
        for r in approx:
            a.setdefault(r.query_id, set()).add(r.match_id)
        e = {}
        for r in exact:
            e.setdefault(r.query_id, set()).add(r.match_id)
        hits = sum(len(a.get(q, set()) & m) for q, m in e.items())
        return hits / sum(len(m) for m in e.values())

    def test_trained_centroids_lift_recall(self, spark, tmp_path):
        from fluent_plugin_sql_spark.operators.similarity import (
            brute_force_topk,
            build_ivf_index,
            ivf_topk_from_index,
        )

        # moderately overlapping modes + nprobe=1: the regime where the
        # arbitrary hash pick visibly loses (two picks land in one
        # mode, splitting it across buckets a 1-probe query can't
        # cover).  Measured at this seed: hash 0.895, kmeans 0.962.
        corpus = self._corpus(spark).localCheckpoint(eager=True)
        queries = corpus.where("vec_id % 23 = 0")  # 21 spread queries
        exact = brute_force_topk(corpus, queries, k=5).collect()
        rec = {}
        for mode in ("hash", "kmeans"):
            path = str(tmp_path / f"ivf_{mode}")
            build_ivf_index(
                corpus, path, num_centroids=12,
                centroid_mode=mode, dim=16, kmeans_iters=4,
            )
            got = ivf_topk_from_index(
                spark, path, queries, k=5, nprobe=1
            ).collect()
            rec[mode] = self._recall(got, exact)
        assert rec["kmeans"] >= rec["hash"] + 0.03
        assert rec["kmeans"] >= 0.93

    def test_kmeans_mode_requires_dim(self, spark, tmp_path):
        from fluent_plugin_sql_spark.operators.similarity import (
            build_ivf_index,
        )

        with pytest.raises(ValueError, match="dim"):
            build_ivf_index(
                self._corpus(spark, modes=2, per=5),
                str(tmp_path / "x"),
                centroid_mode="kmeans",
            )
