"""Round-10 advice fixes, each asserted directly:

1. parse_image_header reports DISPLAY-frame dims for orientation 5-8
   TIFFs (it already did for JPEGs) — header and _read_pixels agree.
2. semdedup_prune / semdedup_cap_stats reject flat caps < 1 at entry
   (0 previously reached F.ceil(_n/0) → ANSI DIVIDE_BY_ZERO at run).
3. kmeans_parallel_centroids guards its driver-side refine collect
   behind a documented element budget.
4. The k-means|| two-level weighting path and assign_two_level's
   empty result are string-id safe (the cell literal assumed int ids).
5. Duplicate-id corpora: flat k-means (v inside the argmin struct) and
   the k-means|| pipeline (dedup before sampling/weighting) now match
   their DuckDB oracles EXACTLY — verified by running the real oracle
   SQL on a dup-id corpus, which diverged before the fix.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.cluster import (
    assign_two_level,
    kmeans_embeddings,
    kmeans_parallel_centroids,
    semdedup_cap_stats,
    semdedup_prune,
)
from fluent_plugin_sql_spark.operators.multimodal import (
    _read_pixels,
    parse_image_header,
)
from fluent_plugin_sql_spark.plans.llm_pipeline import (
    _dd_kmeans_ctes,
    _dd_kmeans_parallel_ctes,
)

from test_tiff_decode import encode_tiff


class TestTiffOrientationHeaderSwap:
    @pytest.mark.parametrize("orientation", [5, 6, 7, 8])
    def test_header_matches_decoded_shape(self, orientation):
        img = (
            np.arange(11 * 7 * 3, dtype=np.uint8).reshape(11, 7, 3) % 256
        )
        payload = encode_tiff(img, orientation=orientation)
        fmt, w, h, ch = parse_image_header(payload)
        assert fmt == "tiff"
        arr = _read_pixels(payload)
        # decoded array is (h, w, c) in the DISPLAY frame — the header
        # must describe the same frame, not the coded one
        assert (h, w, ch) == arr.shape
        assert (w, h) == (11, 7)  # transposed vs the 7×11 coded dims

    @pytest.mark.parametrize("orientation", [None, 1, 2, 3, 4])
    def test_non_transposing_orientations_unchanged(self, orientation):
        img = np.zeros((5, 9, 3), dtype=np.uint8)
        payload = encode_tiff(img, orientation=orientation)
        fmt, w, h, ch = parse_image_header(payload)
        assert (fmt, w, h) == ("tiff", 9, 5)
        assert _read_pixels(payload).shape == (5, 9, 3)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


class TestSemdedupFlatCapValidation:
    def _corpus(self, spark):
        return _emb_df(
            spark, [(i, [float(i), 1.0]) for i in range(6)]
        )

    @pytest.mark.parametrize("bad", [0, -1, -100])
    def test_prune_rejects_nonpositive_caps(self, spark, bad):
        with pytest.raises(ValueError, match="max_cluster_size"):
            semdedup_prune(
                self._corpus(spark), k=2, dim=2, max_cluster_size=bad
            )

    @pytest.mark.parametrize("bad", [0, -1])
    def test_cap_stats_rejects_nonpositive_caps(self, spark, bad):
        with pytest.raises(ValueError, match="max_cluster_size"):
            semdedup_cap_stats(
                self._corpus(spark), k=2, dim=2, max_cluster_size=bad
            )

    def test_valid_caps_still_accepted(self, spark):
        c = self._corpus(spark)
        for cap in ("auto", None, 1, 1000):
            out = semdedup_prune(c, k=2, dim=2, max_cluster_size=cap)
            assert out.count() == 6


class TestParallelRefineDriverBudget:
    def test_over_budget_raises_at_entry(self, spark):
        c = _emb_df(spark, [(i, [float(i)] * 4) for i in range(8)])
        with pytest.raises(ValueError, match="driver_budget_elems"):
            kmeans_parallel_centroids(
                c, k=2, dim=4, l=4, rounds=2, driver_budget_elems=8
            )

    def test_budget_disabled_and_default_pass(self, spark):
        c = _emb_df(spark, [(i, [float(i), 0.5]) for i in range(8)])
        got = kmeans_parallel_centroids(
            c, k=2, dim=2, l=3, rounds=1, driver_budget_elems=None
        ).count()
        assert got == 2
        # default budget is far above any test-scale parameterization
        assert (
            kmeans_parallel_centroids(c, k=2, dim=2, l=3, rounds=1).count()
            == 2
        )


class TestStringIdSafety:
    def _str_corpus(self, spark, n=12):
        rows = [
            (f"doc-{i:03d}", [float(i % 5), float(i % 3), 1.0])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id string, embedding array<double>"
        )

    def test_two_level_weighting_string_ids(self, spark):
        # weight_mode="two_level" previously generated `'doc-000'L` —
        # unparseable SQL, an AnalysisException at build
        cents = kmeans_parallel_centroids(
            self._str_corpus(spark),
            k=2,
            dim=3,
            l=4,
            rounds=2,
            weight_mode="two_level",
        )
        assert cents.count() == 2

    def test_two_level_matches_flat_on_unique_cells(self, spark):
        # same corpus, both weighting paths — centroid SETS may differ
        # (two-level weights are approximate) but both must be valid
        # (cid, c) tables of the requested k
        c = self._str_corpus(spark)
        flat = kmeans_parallel_centroids(
            c, k=2, dim=3, l=4, rounds=2, weight_mode="flat"
        )
        assert flat.count() == 2

    def test_assign_two_level_empty_schema_follows_input(self, spark):
        c = self._str_corpus(spark)
        empty_cents = spark.createDataFrame([], "cid int, c array<double>")
        out = assign_two_level(c, empty_cents, dim=3)
        assert out.count() == 0
        assert dict(out.dtypes)["vec_id"] == "string"

    def test_assign_two_level_string_ids_assigns(self, spark):
        c = self._str_corpus(spark)
        cents = spark.createDataFrame(
            [(0, [0.0, 0.0, 1.0]), (1, [4.0, 2.0, 1.0])],
            "cid int, c array<double>",
        )
        out = assign_two_level(c, cents, dim=3)
        assert out.count() == 12
        assert dict(out.dtypes)["vec_id"] == "string"


def _duck_with_corpus(rows):
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
        }
    )
    con.register("embeddings", pdf)
    return con


# exact binary fractions → bit-identical ingestion in both engines
_DUP_ROWS = [
    (1, [0.25, 0.5, 0.75, 1.0]),
    (1, [3.0, 2.5, 0.125, 0.0]),  # same id, very different vector
    (2, [0.5, 0.5, 0.5, 0.5]),
    (3, [2.75, 2.25, 0.25, 0.125]),
    (4, [0.125, 0.625, 0.875, 1.125]),
    (5, [3.125, 2.0, 0.0, 0.25]),
    (6, [0.375, 0.4375, 0.8125, 0.9375]),
]


class TestDupIdOracleParity:
    """The r9 advice findings were cross-ENGINE divergences on dup-id
    corpora — so the assertion here runs the REAL DuckDB oracle SQL on
    a dup-id corpus and requires exact agreement."""

    def test_flat_kmeans_multi_iter_matches_oracle(self, spark):
        e = _emb_df(spark, _DUP_ROWS)
        got = sorted(
            (r.vec_id, r.cluster, round(r.dist, 4))
            for r in kmeans_embeddings(e, k=2, iters=3, dim=4).collect()
        )
        con = _duck_with_corpus(_DUP_ROWS)
        sql = (
            _dd_kmeans_ctes(2, 3, 4)
            + " SELECT vec_id, cid, round(dist, 4) FROM a3"
        )
        want = sorted(tuple(t) for t in con.execute(sql).fetchall())
        assert got == want

    def test_parallel_pipeline_matches_oracle(self, spark):
        e = _emb_df(spark, _DUP_ROWS)
        cents = kmeans_parallel_centroids(
            e, k=2, dim=4, l=3, rounds=2, refine_iters=2
        )
        got = sorted(
            (r.cid, tuple(round(x, 6) for x in r.c))
            for r in cents.collect()
        )
        ctes, final = _dd_kmeans_parallel_ctes(2, 4, 3, 2, 2)
        con = _duck_with_corpus(_DUP_ROWS)
        want = sorted(
            (cid, tuple(round(x, 6) for x in c))
            for cid, c in con.execute(
                f"{ctes} SELECT cid, c FROM {final}"
            ).fetchall()
        )
        assert got == want

    def test_assignment_retains_argmin_rows_vector(self, spark):
        # id 1's two vectors: the LEXICOGRAPHIC min is [0.25, ...] but
        # whichever is closer to its centroid must be the one the
        # update averages — observable as the 3-iter result matching
        # the oracle above; here we additionally pin the single-iter
        # assignment's dist to the closer vector's distance
        e = _emb_df(spark, _DUP_ROWS)
        one = {
            r.vec_id: r.dist
            for r in kmeans_embeddings(e, k=2, iters=1, dim=4).collect()
        }
        v_a, v_b = _DUP_ROWS[0][1], _DUP_ROWS[1][1]

        def d(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        # replicate the hash init (k=2 smallest-md5 rows, ties by id
        # then vector) and require the dup id's dist to be the min
        # across BOTH its vectors to both seeds
        import hashlib

        def h60(x):
            return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

        ordered = sorted(_DUP_ROWS, key=lambda r: (h60(r[0]), r[0], r[1]))
        seeds = [r[1] for r in ordered[:2]]
        best_any = min(min(d(v_a, s) for s in seeds),
                       min(d(v_b, s) for s in seeds))
        assert one[1] == pytest.approx(best_any)
