"""Round-8 scale hardening: the MinHash verify-join broadcast guard.

Force-broadcasting the candidate neighborhood is only safe while it IS
small; a pathological corpus (everything near-identical) makes candidates
a large fraction of the input and the hint becomes a driver/executor OOM
at scale.  Above a threshold the hints must vanish (AQE decides) with
bit-identical output.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.dedup import minhash_lsh_dup_pairs


def _mk_corpus(spark, n_groups=8, group_size=6):
    """n_groups near-dup cliques plus singletons — a dense candidate set."""
    rows = []
    did = 0
    for g in range(n_groups):
        base = " ".join(f"g{g}tok{j}" for j in range(20))
        for m in range(group_size):
            # one trailing token differs per member → high but <1 Jaccard
            rows.append((did, base + f" tail{m}"))
            did += 1
    for s in range(10):
        rows.append((did, " ".join(f"solo{s}w{j}" for j in range(15))))
        did += 1
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _logical_hint_count(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_minhash_verify_shuffle_path_identical_output(spark):
    corpus = _mk_corpus(spark)

    bc = minhash_lsh_dup_pairs(corpus, "text", "doc_id", threshold=0.7)
    sh = minhash_lsh_dup_pairs(
        corpus, "text", "doc_id", threshold=0.7, broadcast_verify_threshold=0
    )

    # the guard actually changes the plan: hints present on the small
    # path (the a/b verify joins; the cand_ids hint sits behind the
    # localCheckpoint lineage cut), absent on the forced-shuffle path
    assert _logical_hint_count(bc) == 2
    assert _logical_hint_count(sh) == 0

    a = sorted(map(tuple, bc.collect()))
    b = sorted(map(tuple, sh.collect()))
    assert a == b and len(a) > 0
    # sanity: each clique's pairs survived verification
    pair_ids = {p for r in a for p in (r[0], r[1])}
    assert len(pair_ids) >= 40


# --------------------------------------------------------------------------
# 1M-doc store scale proof (VERDICT r7 #3, carried from r6): the probe's
# o(store) I/O claim measured at a size where it could actually fail.
# Slow (several minutes): opt in with SPARK_GRAFT_RUN_SLOW=1.  Measured
# numbers are recorded in ROUND8.md.


def _fs_bytes_read(spark) -> int:
    """Actual bytes read through Hadoop FileSystem in this JVM — in
    local mode executors share the JVM, so this captures the real file
    I/O a probe performs (post row-group/page pruning), which planned
    `filesSize` does not."""
    jvm = spark._jvm  # noqa: SLF001
    tot = 0
    it = jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics().iterator()
    while it.hasNext():
        tot += it.next().getBytesRead()
    return tot


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SLOW") != "1",
    reason="1M-doc store build takes minutes; set SPARK_GRAFT_RUN_SLOW=1",
)
def test_dedup_store_probe_io_flat_at_1m_docs(spark, tmp_path):
    """Grow a MinHash store to 1,000,000 docs over 20 batches; assert a
    compacted probe's files-read stays at its touched-bucket bound and
    its actual bytes-read stays o(store) — the store grew 5x between the
    two measure points, so linear-in-store I/O would show a ~5x byte
    blowup and fail the bound below."""
    from fluent_plugin_sql_spark.operators.dedup import (
        MinHashDedupStore,
        _band_key_rows,
        minhash_signatures,
    )
    from test_llm_ops import _scan_num_files

    path = str(tmp_path / "store_1m")
    store = MinHashDedupStore(spark, path, sig_match_frac=0.5)
    batch_n, n_batches = 50_000, 20

    def batch_df(start):
        # disjoint token sets per doc: every batch genuinely grows the
        # store (no cross-doc near-dups), generated distributed
        return spark.range(start, start + batch_n).selectExpr(
            "id AS doc_id",
            "concat_ws(' ', transform(sequence(0, 11), "
            "j -> concat('w', id, 'x', j))) AS text",
        )

    probe_batch = spark.createDataFrame(
        [(10**9, "totally novel probe words qq ww ee rr tt yy uu ii oo pp")],
        "doc_id LONG, text STRING",
    )
    sig = minhash_signatures(
        probe_batch, "text", "doc_id", store.num_hashes, store.k
    )
    bk = _band_key_rows(sig, store.num_hashes, store.bands).localCheckpoint()

    def measure():
        store.compact()
        scan = store._pruned_band_key_scan(bk)
        files = _scan_num_files(scan)
        b0 = _fs_bytes_read(spark)
        scan.collect()
        scan_bytes = _fs_bytes_read(spark) - b0
        t0 = time.monotonic()
        b1 = _fs_bytes_read(spark)
        n_dups = store.probe_dups(probe_batch, "text", "doc_id").count()
        probe_bytes = _fs_bytes_read(spark) - b1
        wall = time.monotonic() - t0
        assert n_dups == 0
        return files, scan_bytes, probe_bytes, wall

    t_build0 = time.monotonic()
    for i in range(4):
        store.process_batch(batch_df(i * batch_n), "text", "doc_id")
    files_s, scan_b_s, probe_b_s, wall_s = measure()

    for i in range(4, n_batches):
        store.process_batch(batch_df(i * batch_n), "text", "doc_id")
    build_wall = time.monotonic() - t_build0
    files_l, scan_b_l, probe_b_l, wall_l = measure()

    print(
        f"\n1M-doc store proof: store=200k docs -> files={files_s} "
        f"scan_bytes={scan_b_s} probe_bytes={probe_b_s} wall={wall_s:.2f}s; "
        f"store=1M docs -> files={files_l} scan_bytes={scan_b_l} "
        f"probe_bytes={probe_b_l} wall={wall_l:.2f}s; "
        f"build_wall={build_wall:.1f}s"
    )
    # files-read: bounded by the probe's touched buckets, NOT store size
    assert files_l <= max(files_s, 6)
    # bytes-read: the store grew 5x; actual probe I/O must stay well
    # under proportional growth (footers + matched pages only)
    assert scan_b_l <= max(2 * scan_b_s, 4 << 20), (scan_b_s, scan_b_l)
    assert probe_b_l <= max(2 * probe_b_s, 8 << 20), (probe_b_s, probe_b_l)


def test_embedding_dup_pairs_expected_dim_skips_scan(spark):
    """expected_dim pins the dimension without the dominant-dim
    aggregation pass; ragged/zero vectors are still excluded and
    results match the scanning path."""
    from fluent_plugin_sql_spark.operators.dedup import embedding_dup_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),
            (3, [0.5, 0.5]),              # ragged → excluded
            (4, []),                       # empty → excluded
            (5, [0.0, 0.0, 0.0, 0.0]),     # zero-norm → never pairs
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    scan = embedding_dup_pairs(df, "embedding", "vec_id", threshold=0.95).collect()
    pinned = embedding_dup_pairs(
        df, "embedding", "vec_id", threshold=0.95, expected_dim=4
    ).collect()
    assert sorted(map(tuple, scan)) == sorted(map(tuple, pinned))
    assert {(r["id_a"], r["id_b"]) for r in pinned} == {(1, 2)}


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SLOW") != "1",
    reason="80k-vector store build takes ~6 min; set SPARK_GRAFT_RUN_SLOW=1",
)
def test_embedding_store_probe_reads_only_probed_buckets(spark, tmp_path):
    """EmbeddingDedupStore's documented I/O contract: a probe reads
    ~(touched buckets / num_centroids) of the store, never all of it.
    Grow the store 4x; the compacted probe's postings files must stay at
    the probed-bucket bound and its actual bytes must stay a bucket-
    fraction of the store, not track store size."""
    from fluent_plugin_sql_spark.operators.dedup import EmbeddingDedupStore

    dim, n_cent = 16, 16
    store = EmbeddingDedupStore(
        spark, str(tmp_path / "estore_scale"),
        threshold=0.98, num_centroids=n_cent, nprobe=2,
    )

    def batch(start, n):
        # deterministic pseudo-random vectors, generated distributed
        comps = ", ".join(
            f"cast(pmod(xxhash64(concat(cast(id as string), ':{j}')), 1000) "
            f"/ 1000.0 - 0.5 as float)"
            for j in range(dim)
        )
        return spark.range(start, start + n).selectExpr(
            "id AS vec_id", f"array({comps}) AS embedding"
        )

    probe = batch(10**9, 1).localCheckpoint()

    def measure():
        store.compact()
        from test_llm_ops import _scan_num_files

        centroids = store._load_centroids()
        probes = store._assign(
            probe.selectExpr("vec_id AS doc", "embedding AS vec"),
            centroids, store.nprobe,
        )
        bkts = [r[0] for r in probes.select("bucket").distinct().collect()]
        scan = spark.read.parquet(f"{store.path}/postings").where(
            F.col("bucket").isin(bkts)
        )
        files = _scan_num_files(scan)
        b0 = _fs_bytes_read(spark)
        scan.collect()
        scan_bytes = _fs_bytes_read(spark) - b0
        store_bytes = sum(
            f.stat().st_size
            for f in (tmp_path / "estore_scale" / "postings").rglob("*.parquet")
        )
        return len(bkts), files, scan_bytes, store_bytes

    for i in range(2):
        store.process_batch(batch(i * 10_000, 10_000), "embedding", "vec_id")
    bkts_s, files_s, bytes_s, total_s = measure()

    for i in range(2, 8):
        store.process_batch(batch(i * 10_000, 10_000), "embedding", "vec_id")
    bkts_l, files_l, bytes_l, total_l = measure()

    assert total_l > 3 * total_s  # the store really grew ~4x
    # files: one compacted file per probed bucket, regardless of store size
    assert files_l <= max(bkts_l, files_s)
    # bytes: stay a bucket-fraction of the store (x1.8 slack for skewed
    # bucket sizes + footers), never the whole store
    frac = bkts_l / n_cent
    assert bytes_l <= 1.8 * frac * total_l, (bytes_l, frac, total_l)


# --------------------------------------------------------------------------
# ANN sublinearity: the "candidates per query is a corpus FRACTION that
# does not grow with corpus size" claim, measured where it could fail.
# The fast test pins the diagnostic's contract; the slow test measures
# the fractions + wall times at 50k -> 200k vectors (numbers in
# ROUND8.md).


def _synth_embeddings(spark, n: int, dim: int = 64):
    """Deterministic pseudo-random corpus generated JVM-side (no driver
    materialization): component = scaled xxhash of (id, dim-index)."""
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {dim}), i -> "
        f"cast(pmod(xxhash64(id * {dim} + i), 1000) AS DOUBLE) / 1000.0 - 0.5)"
        " AS embedding",
    )


def test_ann_candidate_stats_matches_search_cost(spark):
    """The diagnostic must report the TRUE comparison set of the search:
    every returned top-k row is one of the counted candidates, and the
    LSH count equals an independent bucket-join recount."""
    from fluent_plugin_sql_spark.operators.similarity import (
        ann_candidate_stats,
        hyperplane_buckets,
        ivf_topk,
        lsh_topk,
    )

    corpus = _synth_embeddings(spark, 400)
    queries = corpus.where("vec_id < 5")

    stats = {
        r["query_id"]: r["n_candidates"]
        for r in ann_candidate_stats(
            corpus, queries, "lsh", num_planes=4, num_tables=4
        ).collect()
    }
    # independent recount through the public bucket expression
    b = corpus.select(
        "vec_id", F.explode(hyperplane_buckets("embedding", 4, 4)).alias("bkt")
    )
    qb = b.where("vec_id < 5").withColumnRenamed("vec_id", "qid")
    recount = {
        r["qid"]: r["n"]
        for r in b.join(qb, "bkt")
        .where("vec_id != qid")
        .groupBy("qid")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    }
    assert stats == recount

    # every search result is a counted candidate (cost ≥ results)
    topk = lsh_topk(corpus, queries, k=5, num_planes=4, num_tables=4)
    per_q = {
        r["query_id"]: r["n"]
        for r in topk.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(stats.get(q, 0) >= n for q, n in per_q.items())

    ivf_stats = {
        r["query_id"]: r["n_candidates"]
        for r in ann_candidate_stats(
            corpus, queries, "ivf", num_centroids=8, nprobe=2
        ).collect()
    }
    ivf_per_q = {
        r["query_id"]: r["n"]
        for r in ivf_topk(corpus, queries, k=5, num_centroids=8, nprobe=2)
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(ivf_stats.get(q, 0) >= n for q, n in ivf_per_q.items())

    with pytest.raises(ValueError):
        ann_candidate_stats(corpus, queries, "annoy")


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SLOW") != "1",
    reason="200k-vector ANN measurement takes minutes; set SPARK_GRAFT_RUN_SLOW=1",
)
def test_ann_candidate_fraction_sublinear_at_200k(spark):
    """Grow the corpus 4x (50k -> 200k, dim 64): the candidate FRACTION
    each bucketed method scans must stay flat (sublinearity) and small
    (near its analytic expectation: num_tables/2^num_planes for LSH,
    nprobe/num_centroids for IVF).  Brute force scans 1.0 by definition
    — the contrast that kills it at 100 TB.  Wall times are logged for
    ROUND8.md, asserted only loosely (shared box)."""
    from fluent_plugin_sql_spark.operators.similarity import (
        ann_candidate_stats,
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    fractions = {}
    times = {}
    for n in (50_000, 200_000):
        corpus = _synth_embeddings(spark, n).localCheckpoint(eager=True)
        queries = corpus.where("vec_id < 20")

        lsh_avg = (
            ann_candidate_stats(
                corpus, queries, "lsh", num_planes=8, num_tables=8
            )
            .agg(F.avg("n_candidates"))
            .first()[0]
        )
        ivf_avg = (
            ann_candidate_stats(
                corpus, queries, "ivf", num_centroids=64, nprobe=4
            )
            .agg(F.avg("n_candidates"))
            .first()[0]
        )
        fractions[n] = (lsh_avg / n, ivf_avg / n)

        t = {}
        t0 = time.time()
        assert brute_force_topk(corpus, queries, k=5).count() == 100
        t["brute"] = time.time() - t0
        t0 = time.time()
        assert lsh_topk(corpus, queries, k=5, num_planes=8, num_tables=8).count() > 0
        t["lsh"] = time.time() - t0
        t0 = time.time()
        assert ivf_topk(corpus, queries, k=5, num_centroids=64, nprobe=4).count() > 0
        t["ivf"] = time.time() - t0
        times[n] = t
        print(
            f"\n[ann-scale] n={n}: lsh_frac={fractions[n][0]:.4f} "
            f"ivf_frac={fractions[n][1]:.4f} times={ {k: round(v, 2) for k, v in t.items()} }"
        )

    f50, f200 = fractions[50_000], fractions[200_000]
    # sublinear: 4x the corpus, same (or smaller) scanned fraction
    assert f200[0] <= f50[0] * 1.5, (f50, f200)
    assert f200[1] <= f50[1] * 1.5, (f50, f200)
    # small and near the analytic expectation (x2-3 slack for skew):
    # LSH 8/2^8 = 3.1%, IVF 4/64 = 6.25%
    assert f200[0] < 0.10, f200
    assert f200[1] < 0.20, f200


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SLOW") != "1",
    reason="200k-vector k-means measurement takes minutes; set SPARK_GRAFT_RUN_SLOW=1",
)
def test_kmeans_assign_scales_linearly_at_200k(spark):
    """Grow the corpus 4x (50k -> 200k, dim 64, k=64): Lloyd k-means
    cost is O(N*k*dim) codegen flops + an O(N) argmin shuffle per
    round — wall time must grow roughly with N, never quadratically
    (the broadcast join means the corpus itself never shuffles).
    Output invariants: one row per vector, cluster ids < k, profile
    sizes sum to N.  Walls logged for ROUND8.md, asserted loosely
    (shared box)."""
    from fluent_plugin_sql_spark.operators.cluster import (
        kmeans_cluster_profile,
        kmeans_embeddings,
    )

    walls = {}
    for n in (50_000, 200_000):
        corpus = _synth_embeddings(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        a = kmeans_embeddings(corpus, k=64, iters=2, dim=64)
        n_rows = a.count()
        walls[n] = time.time() - t0
        assert n_rows == n
        prof = kmeans_cluster_profile(corpus, k=64, iters=2, dim=64).collect()
        assert sum(r.size for r in prof) == n
        assert all(0 <= r.cluster < 64 for r in prof)
        print(f"\n[kmeans-scale] n={n}: wall={walls[n]:.2f}s")
    # 4x the data: allow up to 8x wall (fixed stage overhead + box
    # noise) — a quadratic blowup would be ~16x
    assert walls[200_000] <= walls[50_000] * 8, walls
