"""Drift-triggered recluster for the streaming semantic-dedup store:
the rolling mean home-centroid cosine decays under distribution shift,
maybe_recluster fires the store's recluster path, acceptance (replay /
dup-prune) contracts survive, and the pipeline config wires it."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.dedup import EmbeddingDedupStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _mode(axis, eps=0.0, dim=4):
    v = [0.0] * dim
    v[axis] = 1.0
    if eps:
        v[(axis + 1) % dim] = eps
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v]


class TestStoreDrift:
    def _store(self, spark, path, **kw):
        kw.setdefault("threshold", 0.999)
        kw.setdefault("num_centroids", 2)
        kw.setdefault("nprobe", 1)
        kw.setdefault("centroid_mode", "kmeans")
        kw.setdefault("track_drift", True)
        return EmbeddingDedupStore(spark, str(path), **kw)

    def test_baseline_then_decay_then_recluster(self, spark, tmp_path):
        st = self._store(spark, tmp_path / "s1")
        # train distribution: axes 0 and 1
        st.absorb(
            _df(spark, [(i, _mode(i % 2, 0.02 * i)) for i in range(6)]),
            "embedding", "vec_id",
        )
        assert abs(st.drift_ratio() - 1.0) < 1e-9
        # shifted stream: axes 2 and 3 — near-orthogonal to the frozen
        # centroids, so home similarity collapses
        st.absorb(
            _df(spark, [(10 + i, _mode(2 + i % 2, 0.03 * i)) for i in range(6)]),
            "embedding", "vec_id",
        )
        st.absorb(
            _df(spark, [(20 + i, _mode(2 + i % 2, 0.05 * i)) for i in range(6)]),
            "embedding", "vec_id",
        )
        ratio_before = st.drift_ratio()
        assert ratio_before < 0.9
        assert st.maybe_recluster(trigger_ratio=0.9, min_batches=3) is True
        # re-baselined against the NEW centroids
        after = st._read_drift()
        assert after["n_batches"] == 0
        assert abs(st.drift_ratio() - 1.0) < 1e-9
        # the new baseline mean must beat the drifted EWMA — clusters
        # actually rebalanced onto the shifted mass
        before = ratio_before  # ewma/train, train was ~1.0-ish
        assert after["train_mean"] > before * 0.999 + 0.05

    def test_acceptance_preserved_across_recluster(self, spark, tmp_path):
        st = self._store(spark, tmp_path / "s2", threshold=0.95)
        st.absorb(_df(spark, [(0, _mode(0)), (1, _mode(1))]), "embedding", "vec_id")
        for b in range(3):
            st.absorb(
                _df(spark, [(10 + 2 * b, _mode(2, 0.2 * b)),
                            (11 + 2 * b, _mode(3, 0.2 * b))]),
                "embedding", "vec_id",
            )
        assert st.maybe_recluster(trigger_ratio=0.9, min_batches=2) is True
        # replay contract: every absorbed id still probes as a dup of
        # itself after the recluster re-homed the postings
        replay = _df(spark, [(0, _mode(0)), (10, _mode(2))])
        dups = {r.dup for r in st.probe_dups(replay, "embedding", "vec_id").collect()}
        assert dups == {0, 10}
        # near-dup of shifted mass is caught; novel direction is kept
        probe = _df(
            spark,
            [(90, [x * 0.999 for x in _mode(2)]), (91, _mode(1, 0.7))],
        )
        dups = {r.dup for r in st.probe_dups(probe, "embedding", "vec_id").collect()}
        assert 90 in dups
        assert 91 not in dups

    def test_no_fire_paths(self, spark, tmp_path):
        # untracked store: no drift state, never fires
        st = self._store(spark, tmp_path / "s3", track_drift=False)
        st.absorb(_df(spark, [(0, _mode(0)), (1, _mode(1))]), "embedding", "vec_id")
        assert st.drift_ratio() is None
        assert st.maybe_recluster() is False
        # tracked but healthy: ratio ~1, never fires
        st2 = self._store(spark, tmp_path / "s4")
        for b in range(4):
            st2.absorb(
                _df(spark, [(10 * b, _mode(0, 0.01 * b)),
                            (10 * b + 1, _mode(1, 0.01 * b))]),
                "embedding", "vec_id",
            )
        assert st2.drift_ratio() > 0.97
        assert st2.maybe_recluster(trigger_ratio=0.9, min_batches=2) is False
        # tracked + drifted but below min_batches: not yet
        st3 = self._store(spark, tmp_path / "s5")
        st3.absorb(_df(spark, [(0, _mode(0)), (1, _mode(1))]), "embedding", "vec_id")
        st3.absorb(_df(spark, [(2, _mode(2)), (3, _mode(3))]), "embedding", "vec_id")
        assert st3.maybe_recluster(trigger_ratio=0.9, min_batches=5) is False

    def test_lost_drift_state_restarts_baseline(self, spark, tmp_path):
        import shutil

        st = self._store(spark, tmp_path / "s6")
        st.absorb(_df(spark, [(0, _mode(0)), (1, _mode(1))]), "embedding", "vec_id")
        shutil.rmtree(tmp_path / "s6" / "drift")
        assert st.drift_ratio() is None
        # shifted but not exactly orthogonal (a 0.0 baseline cannot
        # express a ratio and drift_ratio correctly stays None for it)
        st.absorb(
            _df(spark, [(2, [0.2, 0.0, 0.98, 0.0]),
                        (3, [0.2, 0.0, 0.0, 0.98])]),
            "embedding", "vec_id",
        )
        # advisory state restarted: this batch became the new baseline
        assert abs(st.drift_ratio() - 1.0) < 1e-9


def test_run_streaming_semantic_drift_recluster(spark, tmp_path):
    """e2e: a shifted second stream decays home similarity, the
    configured recluster_drift_ratio fires the store recluster
    mid-stream, and acceptance is preserved — shifted near-dups are
    still pruned, novel rows still reach the sink."""
    from fluent_plugin_sql_spark.pipeline import Pipeline

    rows = [
        # micro-batch 1 (select_limit=3): training modes on axes 0..2
        (100, _mode(0)), (101, _mode(1)), (102, _mode(2)),
        # micro-batches 2-3: SHIFTED distribution (axis 3 blends) —
        # mutually separated (< tau) so everything is novel
        (103, _mode(3)),
        (104, [0.0, 0.0, 0.6, 0.8]),
        (105, [0.0, 0.6, 0.0, 0.8]),
        (106, [0.6, 0.0, 0.0, 0.8]),
        (107, [0.0, 0.0, -0.6, 0.8]),
        (108, [0.0, -0.6, 0.0, 0.8]),
        # micro-batch 4: a near-copy of 103 (pruned) + a novel row
        (109, [0.001, 0.0, 0.0, 1.0]),
        (110, [-0.6, 0.0, 0.0, 0.8]),
        (111, [0.0, 0.0, 0.0, -1.0]),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
    ).coalesce(1).write.parquet(str(src_dir / "embeddings.parquet"))
    out = tmp_path / "out"
    store_path = tmp_path / "smstore"
    cfg = {
        "source": {
            "path": str(src_dir),
            "select_limit": 3,
            "tables": [{"table": "embeddings", "update_column": "vec_id"}],
            "semantic_dedup": {
                "path": str(store_path),
                "vec_col": "embedding",
                "id_col": "vec_id",
                "tau": 0.95,
                "k": 3,
                "recluster_drift_ratio": 0.9,
                "recluster_min_batches": 2,
            },
        },
        "sink": {"path": str(out), "tables": [{"table": "clean_vecs"}]},
    }
    pipe = Pipeline(spark, cfg)
    queries = pipe.run_streaming(str(tmp_path / "ckpt"))
    try:
        def done():
            try:
                return spark.read.parquet(str(out / "clean_vecs")).count()
            except Exception:
                return 0
        t0 = time.time()
        while time.time() - t0 < 120 and done() < 11:
            time.sleep(0.5)
    finally:
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    got = {r["vec_id"] for r in spark.read.parquet(str(out / "clean_vecs")).collect()}
    assert 109 not in got  # shifted near-dup pruned even after recluster
    assert got == set(range(100, 112)) - {109}
    # the recluster actually fired: drift state was re-baselined
    # (n_batches reset below the number of absorbed batches) and the
    # centroid ids are store doc ids, not the trained table's 0..k-1
    drift = spark.read.parquet(str(store_path / "embeddings" / "drift")).first()
    assert drift is not None
    cents = spark.read.parquet(str(store_path / "embeddings" / "centroids"))
    ids = sorted(r.centroid_id for r in cents.collect())
    assert ids != [0, 1, 2]
    assert min(ids) >= 100


class TestVectorizedTraining:
    """Config-surfaced numeric_mode: the GEMM training path must yield
    the same probe decisions as the fold path on separated modes, and
    the pipeline config must reach the store parameter."""

    def test_vectorized_centroid_training_matches_fold_decisions(
        self, spark, tmp_path
    ):
        batch1 = _df(
            spark,
            [(i, _mode(i % 2, eps=0.02 * (i % 3))) for i in range(12)],
        )
        probe = _df(spark, [(100, _mode(0)), (101, _mode(2))])
        decisions = {}
        for mode in ("fold", "vectorized"):
            st = EmbeddingDedupStore(
                spark,
                str(tmp_path / f"st_{mode}"),
                threshold=0.999,
                num_centroids=2,
                nprobe=1,
                centroid_mode="kmeans",
                numeric_mode=mode,
            )
            st.absorb(batch1, "embedding", "vec_id")
            dups = st.probe_dups(probe, "embedding", "vec_id")
            decisions[mode] = sorted(r.dup for r in dups.collect())
        # axis-0 probe is a near-dup of the absorbed axis-0 mode, the
        # axis-2 probe matches nothing — in BOTH arithmetic modes
        assert decisions["fold"] == decisions["vectorized"] == [100]

    def test_numeric_mode_validated(self, spark, tmp_path):
        import pytest

        with pytest.raises(ValueError, match="numeric_mode"):
            EmbeddingDedupStore(
                spark, str(tmp_path / "bad"), numeric_mode="simd"
            )

    def test_pipeline_config_wires_numeric_mode(self, spark, tmp_path):
        """source.semantic_dedup.numeric_mode reaches the store the
        streaming pipeline builds (semantic_dedup is streaming-only)."""
        from fluent_plugin_sql_spark.pipeline import Pipeline

        cfg = {
            "source": {
                "path": str(tmp_path / "src"),
                "select_limit": 10,
                "tables": [
                    {"table": "embeddings", "update_column": "vec_id"}
                ],
                "semantic_dedup": {
                    "path": str(tmp_path / "smd"),
                    "vec_col": "embedding",
                    "id_col": "vec_id",
                    "tau": 0.95,
                    "k": 2,
                    "numeric_mode": "vectorized",
                },
            },
            "sink": {"path": str(tmp_path / "out"), "tables": [{"table": "catch_all"}]},
        }
        (tmp_path / "src").mkdir()
        _df(spark, [(i, _mode(i % 2)) for i in range(6)]).coalesce(1).write.parquet(
            str(tmp_path / "src" / "embeddings.parquet")
        )
        pipe = Pipeline(spark, cfg)
        # the store objects are built (with the configured mode) when the
        # streams are wired; assert on the built store directly
        queries = pipe.run_streaming(str(tmp_path / "ckpt"))
        try:
            t0 = time.time()
            while time.time() - t0 < 60:
                try:
                    if spark.read.parquet(str(tmp_path / "out" / "catch_all")).count() >= 6:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            for q in queries:
                q.stop()
                q.awaitTermination(30)
        from fluent_plugin_sql_spark.operators.dedup import EmbeddingDedupStore as S

        st = S(spark, str(tmp_path / "smd" / "embeddings"))
        assert st._exists("centroids")
        # and the config value demonstrably reaches the store parameter:
        # an invalid mode must fail at stream wiring with the store's
        # own validation error
        import pytest

        bad = dict(cfg)
        bad["source"] = dict(cfg["source"])
        bad["source"]["semantic_dedup"] = dict(
            cfg["source"]["semantic_dedup"], path=str(tmp_path / "smd2"),
            numeric_mode="simd",
        )
        with pytest.raises(ValueError, match="numeric_mode"):
            Pipeline(spark, bad).run_streaming(str(tmp_path / "ckpt2"))
