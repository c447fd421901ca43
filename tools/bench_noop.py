"""Isolated per-query timing through the noop sink (guide §1.4).

Usage:
    python tools/bench_noop.py [query ...]

Times each named registered query (default: the bench headline set) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with
``df.write.format("noop")`` so the computation is measured, not the
result transfer.  Warm pass at sf0.001 first (codegen compile), then
$SPARK_GRAFT_BENCH_REPS reps (default 3); prints min/med/max JSON per
query.  Jobs are labelled for the UI / event logs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from fluent_plugin_sql_spark.session import get_spark  # noqa: E402
from tools.capture_plans import HEADLINE  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("fpss-bench-noop")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = entry_mod.queries()
    for name in names:  # codegen warmup
        queries[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"noop:{name}:{i}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": round(min(samples), 3),
            "med": round(statistics.median(samples), 3),
            "max": round(max(samples), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main()
