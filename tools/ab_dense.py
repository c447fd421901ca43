"""Interleaved A/B of the fold vs vectorized dense-math paths.

Measures `ann_bruteforce_top5`-shaped work at a size where ARITHMETIC
dominates (the gate query itself — 2 000 × 10 scores at sf0.1 — is
fixed-overhead-bound, so per-core fold throughput is invisible there):
the corpus is replicated ``--xcorpus`` times with remapped ids and ALL
embeddings rows serve as queries, giving |corpus|×|queries| ≈ 16M
scored pairs at the defaults.  Also A/Bs one Lloyd k-means assignment
at k=--kk.  Runs are INTERLEAVED (fold, vec, fold, vec, …) so slow
drift hits both modes equally; medians are reported.

Usage: python tools/ab_dense.py [sf_dir] [--runs N] [--xcorpus M] [--kk K]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from fluent_plugin_sql_spark.operators.cluster import kmeans_embeddings
    from fluent_plugin_sql_spark.operators.similarity import brute_force_topk
    from fluent_plugin_sql_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=")[0].lstrip("-"): a.split("=")[1]
        for a in sys.argv[1:]
        if a.startswith("--")
    }
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = int(opts.get("runs", 3))
    xcorpus = int(opts.get("xcorpus", 1))
    kk = int(opts.get("kk", 256))
    which = opts.get("cases", "ann,kmeans").split(",")

    spark = get_spark("ab-dense")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # remapped-id replicas: same vectors, distinct ids — scales the
    # score count without changing the distribution
    parts = int(opts.get("partitions", 0))
    corpus = emb.crossJoin(
        spark.range(xcorpus).select(F.col("id").alias("_r"))
    ).select(
        (F.col("vec_id") * 1000 + F.col("_r")).alias("vec_id"),
        "embedding",
    )
    if parts:
        corpus = corpus.repartition(parts)
    corpus = corpus.localCheckpoint(eager=True)
    queries = emb.localCheckpoint(eager=True)
    nc, nq = corpus.count(), queries.count()
    print(
        f"# corpus={nc} queries={nq} pairs={nc * nq / 1e6:.1f}M "
        f"k-means k={kk}",
        file=sys.stderr,
    )

    def bench(fn):
        t0 = time.monotonic()
        n = fn().count()
        return time.monotonic() - t0, n

    results: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    cases = {}
    if "ann" in which:
        cases["ann_fold"] = lambda: brute_force_topk(corpus, queries, k=5)
        cases["ann_vec"] = lambda: brute_force_topk(
            corpus, queries, k=5, numeric_mode="vectorized"
        )
    if "kmeans" in which:
        cases["kmeans_fold"] = lambda: kmeans_embeddings(
            corpus, k=kk, iters=1, dim=64
        )
        cases["kmeans_vec"] = lambda: kmeans_embeddings(
            corpus, k=kk, iters=1, dim=64, numeric_mode="vectorized"
        )
    if "large" in which:
        from fluent_plugin_sql_spark.operators.cluster import (
            kmeans_large_embeddings,
        )

        cases["large_fold"] = lambda: kmeans_large_embeddings(
            corpus, k=kk, dim=64, rounds=2, refine_iters=2, nprobe=2
        )
        cases["large_vec"] = lambda: kmeans_large_embeddings(
            corpus, k=kk, dim=64, rounds=2, refine_iters=2, nprobe=2,
            numeric_mode="vectorized",
        )
    for i in range(runs):
        for name, fn in cases.items():  # interleaved by construction
            dt, n = bench(fn)
            results.setdefault(name, []).append(dt)
            counts[name] = n
            print(f"# run {i}: {name} {dt:.3f}s ({n} rows)", file=sys.stderr)

    med = {k: round(statistics.median(v), 3) for k, v in results.items()}
    out = {
        "metric": "ab_dense_median_sec",
        "sf_dir": sf_dir,
        "pairs_millions": round(nc * nq / 1e6, 1),
        "medians": med,
        "rows": counts,
        "runs": runs,
    }
    if "ann_fold" in med:
        out["speedup_ann"] = round(med["ann_fold"] / med["ann_vec"], 2)
    if "kmeans_fold" in med:
        out["speedup_kmeans"] = round(
            med["kmeans_fold"] / med["kmeans_vec"], 2
        )
    if "large_fold" in med:
        out["speedup_large"] = round(med["large_fold"] / med["large_vec"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
