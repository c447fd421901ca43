"""Capture .explain("formatted") for named registered queries.

Usage:
    python tools/capture_plans.py OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (default: the bench
headline set).  Plans are built against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) — planning only, nothing executes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from fluent_plugin_sql_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "top3_orders_per_customer",
    "tumbling_window_counts",
    "session_windows",
    "asof_join_purchase_click",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_top5",
    "text_stats",
    "incremental_scan",
]


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fpss-capture-plans")
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
