"""Large-k k-means (operators/cluster): k-means|| centroid training
(deterministic md5-priority oversampling + weighted k-means++ refine)
and the two-level coarse→fine assignment.  Cross-engine replication is
the gate queries `kmeans_parallel_centroids` / `kmeans_two_level_assign`
(full value-hash DuckDB oracles re-running the whole pipeline); the
k≥4096 scale proof is tests/test_scale_r9.py (slow-marked)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.cluster import (
    _assign,
    _valid_vectors,
    assign_two_level,
    kmeans_embeddings,
    kmeans_large_embeddings,
    kmeans_parallel_centroids,
)

DIM = 8


def _blobs(spark, modes=6, per=50, scale=8.0, spread=0.3, seed=3):
    g = np.random.default_rng(seed)
    centers = g.normal(0, scale, (modes, DIM))
    rows = []
    i = 0
    for m in range(modes):
        for _ in range(per):
            v = centers[m] + g.normal(0, spread, DIM)
            rows.append((i, [float(x) for x in v]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, centers


def _inertia(df, cents):
    e = _valid_vectors(df, "embedding", "vec_id", DIM)
    return _assign(e, cents).agg(F.sum("dist")).first()[0]


@pytest.mark.usefixtures("spark")
class TestKmeansParallel:
    def test_trains_k_centroids_near_flat_lloyd_quality(self, spark):
        df, _ = _blobs(spark)
        cents = kmeans_parallel_centroids(
            df, k=6, dim=DIM, l=12, rounds=2, refine_iters=2
        ).localCheckpoint(eager=True)
        assert cents.count() == 6
        par = _inertia(df, cents)
        flat = (
            kmeans_embeddings(df, k=6, iters=3, dim=DIM, init="farthest")
            .agg(F.sum("dist"))
            .first()[0]
        )
        # the weighted k-means++ refine recovers modes well enough to
        # land within 2x of the farthest-init full-corpus Lloyd run
        # (measured at this seed: 249 vs 210)
        assert par <= 2.0 * flat

    def test_deterministic_across_partitionings(self, spark):
        df, _ = _blobs(spark, modes=4, per=30)
        outs = []
        for parts in (2, 9, 17):
            got = sorted(
                (r.cid, tuple(r.c))
                for r in kmeans_parallel_centroids(
                    df.repartition(parts), k=4, dim=DIM, l=8, rounds=2
                ).collect()
            )
            outs.append(got)
        assert outs[0] == outs[1] == outs[2]

    def test_duplicate_ids_deterministic(self, spark):
        df, _ = _blobs(spark, modes=3, per=20)
        dup = df.unionByName(
            spark.createDataFrame(
                [(7, [99.0] * DIM), (7, [-5.0] * DIM)],
                "vec_id long, embedding array<double>",
            )
        )
        a = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                dup.repartition(3), k=3, dim=DIM, l=6
            ).collect()
        )
        b = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                dup.repartition(13), k=3, dim=DIM, l=6
            ).collect()
        )
        assert a == b

    def test_dirty_inputs_never_raise(self, spark):
        rows = [
            (0, [1.0] * DIM),
            (1, [2.0] * DIM),
            (2, [9.0] * DIM),
            (3, [9.1] * DIM),
            (None, [3.0] * DIM),
            (5, None),
            (6, [1.0] * (DIM - 1)),
            (7, [float("nan")] * DIM),
            (8, [float("inf")] * DIM),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cents = kmeans_parallel_centroids(df, k=2, dim=DIM, l=4)
        assert 1 <= cents.count() <= 2

    def test_empty_and_nonfinite_corpus_yield_empty(self, spark):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        assert kmeans_parallel_centroids(empty, k=4, dim=DIM).count() == 0
        bad = spark.createDataFrame(
            [(0, [float("nan")] * DIM), (1, [float("inf")] * DIM)],
            "vec_id long, embedding array<double>",
        )
        assert kmeans_parallel_centroids(bad, k=4, dim=DIM).count() == 0

    def test_fewer_candidates_than_k_returns_fewer(self, spark):
        # 3 distinct points, k=8: at most 3 pickable seeds — like hash
        # init on a tiny corpus, never an error
        rows = [(i, [float(i * 5)] * DIM) for i in range(3)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        n = kmeans_parallel_centroids(df, k=8, dim=DIM, l=4).count()
        assert 1 <= n <= 3

    def test_param_guards(self, spark):
        df, _ = _blobs(spark, modes=2, per=5)
        with pytest.raises(ValueError, match="rounds"):
            kmeans_parallel_centroids(df, k=2, dim=DIM, rounds=0)
        with pytest.raises(ValueError, match="rounds"):
            kmeans_parallel_centroids(df, k=2, dim=DIM, refine_iters=0)
        with pytest.raises(ValueError, match="weight_mode"):
            kmeans_parallel_centroids(df, k=2, dim=DIM, weight_mode="typo")

    def test_two_level_weighting_matches_flat_on_separable(self, spark):
        # on well-separated blobs no mass straddles a cell boundary, so
        # the O(sqrt|C|) router must produce EXACTLY the flat weights
        # and therefore bit-identical trained centroids
        df, _ = _blobs(spark)
        flat = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                df, k=6, dim=DIM, l=12, weight_mode="flat"
            ).collect()
        )
        two = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                df, k=6, dim=DIM, l=12, weight_mode="two_level"
            ).collect()
        )
        assert flat == two and len(flat) == 6

    def test_two_level_weighting_deterministic(self, spark):
        df, _ = _blobs(spark, modes=4, per=30)
        outs = []
        for parts in (3, 13):
            outs.append(
                sorted(
                    (r.cid, tuple(r.c))
                    for r in kmeans_parallel_centroids(
                        df.repartition(parts), k=4, dim=DIM, l=8,
                        weight_mode="two_level",
                    ).collect()
                )
            )
        assert outs[0] == outs[1]

    def test_auto_uses_flat_below_threshold(self, spark):
        # gate-scale candidate sets must take the flat path (the DuckDB
        # oracles model it unconditionally): auto == flat bit-identical
        df, _ = _blobs(spark, modes=3, per=20)
        auto = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                df, k=3, dim=DIM, l=8, weight_mode="auto"
            ).collect()
        )
        flat = sorted(
            (r.cid, tuple(r.c))
            for r in kmeans_parallel_centroids(
                df, k=3, dim=DIM, l=8, weight_mode="flat"
            ).collect()
        )
        assert auto == flat


@pytest.mark.usefixtures("spark")
class TestTwoLevelAssign:
    def test_exact_when_probing_all_cells(self, spark):
        # nprobe >= number of coarse cells: two-level degenerates to
        # flat assignment exactly (same centroids, same argmin)
        df, _ = _blobs(spark)
        cents = kmeans_parallel_centroids(
            df, k=6, dim=DIM, l=12, rounds=2
        ).localCheckpoint(eager=True)
        flat = {
            (r.vec_id, r.cid, r.dist)
            for r in _assign(
                _valid_vectors(df, "embedding", "vec_id", DIM), cents
            ).collect()
        }
        two = {
            (r.vec_id, r.cluster, r.dist)
            for r in assign_two_level(
                df, cents, dim=DIM, coarse_k=3, nprobe=3
            ).collect()
        }
        assert two == flat

    def test_nprobe1_inertia_close_to_flat(self, spark):
        df, _ = _blobs(spark)
        cents = kmeans_parallel_centroids(
            df, k=6, dim=DIM, l=12, rounds=2
        ).localCheckpoint(eager=True)
        flat = _inertia(df, cents)
        a1 = (
            assign_two_level(df, cents, dim=DIM, coarse_k=3, nprobe=1)
            .agg(F.sum("dist"))
            .first()[0]
        )
        # separated blobs: the nearest fine centroid is almost always
        # in the nearest coarse cell
        assert a1 <= 1.2 * flat
        # every vector still gets assigned (probing never drops rows)
        assert (
            assign_two_level(df, cents, dim=DIM, coarse_k=3, nprobe=1).count()
            == df.count()
        )

    def test_assigns_nan_inf_rows_without_error(self, spark):
        rows = [(i, [float(i)] * DIM) for i in range(10)]
        rows += [(90, [float("nan")] * DIM), (91, [float("inf")] * DIM)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cents = kmeans_parallel_centroids(df, k=2, dim=DIM, l=4)
        out = assign_two_level(df, cents, dim=DIM, nprobe=1).collect()
        assert {r.vec_id for r in out} == set(range(10)) | {90, 91}

    def test_empty_cents_empty_result(self, spark):
        df, _ = _blobs(spark, modes=2, per=5)
        empty = spark.createDataFrame([], "cid int, c array<double>")
        assert assign_two_level(df, empty, dim=DIM).count() == 0

    def test_nprobe_guard(self, spark):
        df, _ = _blobs(spark, modes=2, per=5)
        cents = kmeans_parallel_centroids(df, k=2, dim=DIM, l=4)
        with pytest.raises(ValueError, match="nprobe"):
            assign_two_level(df, cents, dim=DIM, nprobe=0)

    def test_composed_large_path(self, spark):
        df, _ = _blobs(spark)
        out = kmeans_large_embeddings(
            df, k=6, dim=DIM, l=12, nprobe=2
        ).collect()
        assert len(out) == 300
        assert len({r.cluster for r in out}) >= 4


@pytest.mark.usefixtures("spark")
class TestIvfParallelMode:
    def test_build_ivf_index_kmeans_parallel(self, spark, tmp_path):
        from fluent_plugin_sql_spark.operators.similarity import (
            build_ivf_index,
            ivf_topk_from_index,
        )

        df, _ = _blobs(spark, modes=8, per=25)
        path = str(tmp_path / "ivfp")
        build_ivf_index(
            df, path, num_centroids=8,
            centroid_mode="kmeans_parallel", dim=DIM,
        )
        got = ivf_topk_from_index(
            spark, path, df.where("vec_id % 37 = 0"), k=3, nprobe=2
        ).collect()
        assert len(got) > 0
        per_q: dict = {}
        for r in got:
            per_q.setdefault(r.query_id, []).append(r.rank)
        assert all(sorted(v) == list(range(1, len(v) + 1))
                   for v in per_q.values())

    def test_parallel_mode_requires_dim(self, spark, tmp_path):
        from fluent_plugin_sql_spark.operators.similarity import (
            build_ivf_index,
        )

        df, _ = _blobs(spark, modes=2, per=5)
        with pytest.raises(ValueError, match="dim"):
            build_ivf_index(
                df, str(tmp_path / "x"), centroid_mode="kmeans_parallel"
            )
