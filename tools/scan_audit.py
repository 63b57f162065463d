"""Repeated-subtree scan audit: plan every catalog query and flag
plans where the SAME parquet scan (location + pushed schema) appears
two or more times.

Why: Catalyst INLINES repeated DataFrame references — it never shares
them — so a query that counts two stages derived from one frame, or
joins a frame back to an aggregate of itself, silently re-scans (and
re-computes) the whole lineage per reference. At 100 TB a duplicated
corpus text scan is the difference between one pass and two. The r10
sweep caught curation_funnel_gated holding 27 corpus text scans for a
7-row funnel report (now 0 in the executed plan; flags-frame rewrite
in pipelines/curation.py).

A duplicate is NOT automatically a defect — legitimate shapes:
- self-joins (near-dup pair L/R sides, as-of join snapshots);
- two logical passes over the corpus (unigram LM: count table +
  scoring pass; BPE: dictionary build + attach);
- scan-twice-instead-of-materialize, when the re-read is cheaper than
  checkpointing a corpus-width intermediate (lsh_topk attaches
  vectors at verify time rather than carrying them through the band
  explode BY DESIGN).
The audit surfaces candidates; the verdict needs the operator's scale
note. Fixes so far use three moves: conditional aggregation over one
flags frame (funnel), carrying columns through a transform instead of
joining back (ivf_index), and a skinny localCheckpoint when several
consumers genuinely need the same small result (phash cluster map,
recall-contract id sets).

Usage:
    python tools/scan_audit.py [sf_dir] [query ...]   # default: all
Prints one line per flagged query; exits 0 always (advisory).
"""

from __future__ import annotations

import collections
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPENSIVE = ("text:string", "embedding")


def main() -> int:
    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    n_flagged = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — advisory tool
            print(f"{name}: ERROR {str(e)[:100]}")
            continue
        # signature = (location, pushed filters, schema): two scans of
        # the same file with DIFFERENT pushed filters are different
        # passes (e.g. an even/odd corpus split), not a duplicate
        sigs, loc, pf = [], "?", ""
        for s in re.findall(
            r"Location:[^\n]*|PushedFilters: [^\n]*|ReadSchema: [^\n]*", plan
        ):
            if s.startswith("Location"):
                loc, pf = s, ""
            elif s.startswith("PushedFilters"):
                pf = s
            else:
                sigs.append((loc, pf, s))
        dups = {
            k: v
            for k, v in collections.Counter(sigs).items()
            if v >= 2 and any(m in k[2] for m in EXPENSIVE)
        }
        if dups:
            n_flagged += 1
            detail = ", ".join(
                f"{v}x {k[2][:70]}" for k, v in sorted(dups.items())
            )
            print(f"{name}: {detail}")
    print(f"-- {n_flagged} queries with repeated expensive scans")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
