"""Phase-level timing of the rollup_store_histogram gate (guide §1):
absorb x3 / compact / snapshot+collect, each labelled and wall-timed.

Usage: python tools/profile_rollup.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from fluent_plugin_sql_spark.io import load_table
from fluent_plugin_sql_spark.operators.rollup import RollupStore
from fluent_plugin_sql_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-rollup")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ev = load_table(spark, sf_dir, "events")
    sc = spark.sparkContext

    t_all = time.perf_counter()
    path = tempfile.mkdtemp(prefix="rollup_prof_")
    phases: list[tuple[str, float]] = []
    try:
        t0 = time.perf_counter()
        store = RollupStore(
            spark, f"{path}/s", "ts", "1 hour",
            dims=("event_type",), hist_cols={"value": (0.0, 400.0, 80)},
        )
        phases.append(("open", time.perf_counter() - t0))
        for b in (0, 1, 2):
            sc.setJobDescription(f"absorb b{b}")
            t0 = time.perf_counter()
            store.absorb(ev.where(F.col("event_id") % 3 == b), f"b{b}")
            phases.append((f"absorb b{b}", time.perf_counter() - t0))
        sc.setJobDescription("compact")
        t0 = time.perf_counter()
        store.compact()
        phases.append(("compact", time.perf_counter() - t0))
        sc.setJobDescription("snapshot")
        t0 = time.perf_counter()
        out = (
            store.snapshot()
            .select(
                "w_start", "event_type",
                F.posexplode("hg_value").alias("bin", "cnt"),
            )
            .where(F.col("cnt") > 0)
        )
        rows = out.localCheckpoint(eager=True).collect()
        phases.append(("snapshot+collect", time.perf_counter() - t0))
        print(f"rows={len(rows)}")
    finally:
        shutil.rmtree(path, ignore_errors=True)
    for name, sec in phases:
        print(f"{name:>20}: {sec:.3f}s")
    print(f"{'TOTAL':>20}: {time.perf_counter() - t_all:.3f}s")


if __name__ == "__main__":
    main()
