"""Cold sf1 receipts (r11 VERDICT item 4): run scale-path catalog rows
against a FRESH-synthesized sf1 (tools/gen_sf.py — not an sf0.1
replica: continuous key space, no replica cliques) and report each
row's cold wall next to its recorded sf0.1 cold number.

sf1 is 10x the sf0.1 data volume; a linear-plan row should land near
10x or below (fixed costs amortize), and anything far above is a
scaling bug to chase.

WHAT IS DELIBERATELY NOT RUN HERE — the exact-Jaccard pair family
(dedup_pagerank, dedup_incremental_cc, text_dedup_representatives,
curation_decontaminate_clusters, curation_funnel_gated,
sample_split_ngram_overlap, and every other shared_jaccard_pairs
consumer): on the TESTDATA-contract corpus (31-word vocab, 10-100
token docs) the TRUE near-dup graph is a constant FRACTION of all doc
pairs — measured via exact 31-bit token-set masks:

    sf0.1:  1,711,566 pairs at J>=0.85 of 12,497,500 total (13.7%)
    sf1:  185,120,974 pairs at J>=0.85 of 1,249,975,000 total (14.8%)

i.e. 108x edges for 10x docs. Any correct near-dup detector's OUTPUT
is Theta(n^2) on this corpus by definition, so sf1-on-faithful-data
cannot be a linear-scaling read for that family — their fair receipts
are the token-rewritten DISTINCT-mode replicas (constant dup density;
tools/scale_probe.py --doc-mode distinct, PLANS.md r10/r11 10x/100x/
1000x records). The 100 TB near-dup path remains MinHash-LSH banding
with the tested max_bucket skew cap, not the exact pair engine.

Usage:
    python tools/gen_sf.py --sf 1.0 --dir /tmp/sf1     # once
    python tools/sf1_receipts.py [--dir /tmp/sf1] [--queries a,b,...]

Methodology matches bench.py's cold pass: one session, each row's
FIRST run timed through the noop sink (full computation, no collect).
Per-row failures are recorded and the sweep continues.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Scale-path receipt set: the most expensive registered rows by
# BENCH_LOCAL_r11 queries_cold that are NOT in the pair family, plus
# one representative per linear/bucketed operator family, plus the two
# rows whose teacher-percentile window was re-keyed this round
# (curation_score_distill / curation_logreg_train — the r11 perf-weak
# fix; their ratio vs the OLD global-window cold number is the
# receipt that the fix holds at 10x).
DEFAULT = [
    # top-10 members on the scale path
    # NOTE (r13 two-point receipts): stream_dedup_incremental is the
    # EXACT-Jaccard probe member of the streaming pair — on the
    # tiny-vocab contract corpus every arriving doc has Theta(n) true
    # near-dup candidates in the store, so exact accept/reject work is
    # Theta(n^2) BY CONSTRUCTION (measured: sf1->sf5 = 16.1x for 5x
    # data), same classification as the batch pair family above. Read
    # its receipt as the correctness row's cost, not the scale path:
    # the production probe is the banded MinHash index with the
    # max_bucket skew cap (bench_dedup_incremental_minhash — measured
    # 1.6x for 5x data at the same two points).
    "stream_dedup_incremental",
    "similarity_pq_topk",
    "similarity_near_dup_clusters_banded",
    "similarity_pca_top1",
    # fixed-this-round rows (per-stratum teacher percentile)
    "curation_score_distill",
    "curation_logreg_train",
    # linear/bucketed family representatives
    "similarity_kmeans_refine",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "sample_dsir_select",
    "text_cdc_chunks",
    "text_winnow_containment",
    "text_bm25_topk",
    "text_bpe_segment",
    "text_c4_filters",
    "text_token_stats",
    "q1_pricing_summary",
    "q5_nation_revenue",
    "q14_promo_effect",
    "q19_bracket_revenue",
    "events_hourly_tumbling",
    "events_sessionization",
    "events_hypertable_rollup",
    "layout_shard_manifest",
    "scoring_customer_health",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--baseline", default=None,
                    help="BENCH_LOCAL_r*.json to ratio against "
                    "(default: newest in repo root)")
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else DEFAULT

    from hummingbirddatapipeline_spark.catalog import BENCH_ONLY, QUERIES
    from hummingbirddatapipeline_spark.session import get_spark, tune_for_sf

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_path = args.baseline
    if base_path is None:
        import glob
        cands = sorted(glob.glob(os.path.join(repo, "BENCH_LOCAL_r*.json")))
        base_path = cands[-1] if cands else None
    baseline = {}
    if base_path:
        with open(base_path) as f:
            baseline = json.load(f).get("queries_cold", {})

    spark = get_spark("hummingbird-sf1-receipts")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_sf(spark, args.dir)

    runnable = {**QUERIES, **BENCH_ONLY}
    unknown = sorted(set(names) - set(runnable))
    if unknown:
        print(f"unknown row name(s): {unknown}")
        spark.stop()
        sys.exit(1)

    results, errors = {}, {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = runnable[name](spark, args.dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # record and continue the sweep
            errors[name] = str(e).split("\n")[0][:200]
            print(json.dumps({"query": name, "err": errors[name]}))
            continue
        dt = round(time.perf_counter() - t0, 3)
        results[name] = dt
        ratio = round(dt / baseline[name], 1) if baseline.get(name) else None
        print(json.dumps({"query": name, "sec": dt, "vs_sf01_cold": ratio}),
              flush=True)

    print(json.dumps({
        "metric": "sf1_receipts_total",
        "dir": args.dir,
        "value": round(sum(results.values()), 1),
        "n_queries": len(results),
        "n_errors": len(errors),
        "baseline": os.path.basename(base_path) if base_path else None,
    }))
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
