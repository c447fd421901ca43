"""Per-job/stage breakdown for one registered query (guide §7.1).

Usage:
    python tools/profile_query.py QUERY [reps]

Runs QUERY at $SPARK_GRAFT_SF_DIR (default sf0.1) with the Spark UI
enabled, then dumps every job and stage (name, duration, task count,
shuffle bytes) from the UI REST API — the local-mode stand-in for the
Stages tab.  First rep is the warm rep (sf0.001 pass ran before it).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from fluent_plugin_sql_spark.session import get_spark  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "fpss-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = entry_mod.queries()
    queries[name](spark, "/root/testdata/sf0.001").collect()  # codegen warm
    sc = spark.sparkContext
    for i in range(reps):
        sc.setJobDescription(f"profiled:{name}:{i}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        print(f"rep {i}: {time.perf_counter() - t0:.3f}s", flush=True)
    sc.setJobDescription(None)

    base = "http://localhost:4050/api/v1"
    app_id = _get(f"{base}/applications")[0]["id"]
    jobs = _get(f"{base}/applications/{app_id}/jobs")
    stages = {s["stageId"]: s for s in _get(f"{base}/applications/{app_id}/stages")}
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        desc = j.get("description", "") or ""
        if f"profiled:{name}" not in desc:
            continue
        sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        dur = time.mktime(comp) - time.mktime(sub)
        # sub-second precision from the GMT strings' .SSS part
        dur += (
            int(j["completionTime"][20:23]) - int(j["submissionTime"][20:23])
        ) / 1000.0
        print(f"\njob {j['jobId']} [{desc.split(':')[-1]}] {dur:.3f}s "
              f"tasks={j['numTasks']}")
        for sid in sorted(j["stageIds"]):
            s = stages.get(sid)
            if s is None:
                print(f"  stage {sid}: (skipped)")
                continue
            print(
                f"  stage {sid}: {s['status']} {s.get('executorRunTime', 0)}ms-exec "
                f"tasks={s['numCompleteTasks']} "
                f"in={s.get('inputBytes', 0)} shr={s.get('shuffleReadBytes', 0)} "
                f"shw={s.get('shuffleWriteBytes', 0)} | {s['name'].splitlines()[0][:90]}"
            )


if __name__ == "__main__":
    main()
