"""Plan-audit helper: prints the load-bearing lines of each headline
query's formatted physical plan (scan pushdown, join strategies,
partial aggregation, window/top-k shape, codegen spans).

Usage:
    python tools/explain_audit.py [query ...]     # default: bench set

Keeps PLANS.md honest — re-run after operator changes and diff.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEY_MARKERS = (
    "Scan",
    "PushedFilters",
    "ReadSchema",
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "HashAggregate",
    "WholeStageCodegen",
    "Window",
    "WindowGroupLimit",
    "partial",
)


def main() -> None:
    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        import bench

        names = bench.HEADLINE
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        print("=" * 24, name)
        for line in plan.splitlines():
            if any(k in line for k in KEY_MARKERS):
                print(line[:160])


if __name__ == "__main__":
    main()
