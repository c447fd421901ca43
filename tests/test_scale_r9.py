"""Round-9 scale proof: large-k centroid training + two-level
assignment at k=4096 — the regime the round-8 verdict named as the
remaining k-means seam (farthest init is k−1 sequential driver scans;
flat ``_assign`` generates N×k fold rows per pass).

Slow (minutes): opt in with ``SPARK_GRAFT_RUN_SLOW=1``.  What it
measures, on a 100k-vector / dim-32 synthetic multi-mode corpus:

- ``kmeans_parallel_centroids`` trains k=4096 centroids in bounded
  passes (2 oversampling rounds of l=8192, weighted refine on ~16k
  candidates) — wall-clock recorded.
- ``assign_two_level`` (m=64 coarse cells ⇒ 64 + nprobe·64 folds per
  vector instead of 4096) agrees with the EXACT flat assignment on the
  same centroids: inertia ratio and assignment-agreement fraction are
  the proof that the approximation is tight where it matters, and the
  flat pass's wall-clock is the cost it avoids.

The numbers land in ROUND9.md §(scale proof)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.operators.cluster import (
    _assign,
    _valid_vectors,
    assign_two_level,
    kmeans_parallel_centroids,
)

N, DIM, K = 100_000, 32, 4096
MODES = 512


def _corpus(spark):
    g = np.random.default_rng(11)
    centers = g.normal(0, 4, (MODES, DIM))
    idx = g.integers(0, MODES, N)
    vecs = centers[idx] + g.normal(0, 0.6, (N, DIM))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SLOW") != "1",
    reason="k=4096 training over 100k vectors takes minutes; "
    "set SPARK_GRAFT_RUN_SLOW=1",
)
def test_large_k_parallel_train_and_two_level_assign(spark):
    df = _corpus(spark).localCheckpoint(eager=True)

    t0 = time.monotonic()
    cents = kmeans_parallel_centroids(
        df, k=K, dim=DIM, l=2 * K, rounds=2, refine_iters=2
    ).localCheckpoint(eager=True)
    t_train = time.monotonic() - t0
    n_cents = cents.count()
    # sampling yields ~2 rounds x 8192 candidates; seeding must reach k
    assert n_cents == K

    e = _valid_vectors(df, "embedding", "vec_id", DIM).localCheckpoint(
        eager=True
    )

    t0 = time.monotonic()
    flat = _assign(e, cents).localCheckpoint(eager=True)
    flat_inertia = flat.agg(F.sum("dist")).first()[0]
    t_flat = time.monotonic() - t0

    results = {}
    for nprobe in (1, 4):
        t0 = time.monotonic()
        two = assign_two_level(
            df, cents, dim=DIM, coarse_k=64, nprobe=nprobe
        ).localCheckpoint(eager=True)
        two_inertia = two.agg(F.sum("dist")).first()[0]
        t_two = time.monotonic() - t0
        assert two.count() == N
        joined = flat.select(
            "vec_id", F.col("cid").alias("fc")
        ).join(two.select("vec_id", F.col("cluster").alias("tc")), "vec_id")
        agree = (
            joined.where(F.col("fc") == F.col("tc")).count() / joined.count()
        )
        ratio = two_inertia / flat_inertia
        results[nprobe] = (ratio, agree)
        print(
            f"\nSCALE-R9 k={K} N={N} dim={DIM} nprobe={nprobe}: "
            f"train={t_train:.0f}s flat_assign={t_flat:.0f}s "
            f"two_level={t_two:.0f}s inertia_ratio={ratio:.4f} "
            f"agreement={agree:.4f}"
        )
    # fine_replicas=2 (the default) keeps boundary-straddling fine
    # centroids visible from one probed cell; without it this corpus
    # measured ratio 1.43 at nprobe=1 (cells cut through modes)
    assert results[1][0] <= 1.25 and results[1][1] >= 0.75
    assert results[4][0] <= 1.05 and results[4][1] >= 0.92
