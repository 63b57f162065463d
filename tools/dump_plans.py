"""Dump `.explain("formatted")` output for named catalog/bench queries
to a directory — the judge-facing plan artifact for optimization
rounds (plans/r{N}/<query>_{before,after}.txt).

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX <query ...>

SUFFIX is appended to each file name (e.g. "before" / "after").
The special name ``shared_jaccard_pairs`` / ``shared_jaccard_cc``
resolve to the shared fixtures in catalog.dedup_q (r15+)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)

    from hummingbirddatapipeline_spark.catalog import BENCH_ONLY, QUERIES
    from hummingbirddatapipeline_spark.session import get_spark, tune_for_sf
    from hummingbirddatapipeline_spark.catalog import dedup_q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_sf(spark, sf_dir)
    runnable = {**QUERIES, **BENCH_ONLY}
    for extra in ("shared_jaccard_pairs", "shared_jaccard_cc"):
        if hasattr(dedup_q, extra):
            runnable.setdefault(extra, getattr(dedup_q, extra))

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        if name not in runnable:
            print(f"SKIP {name} (not registered)")
            continue
        df = runnable[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
