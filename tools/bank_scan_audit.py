"""Repeated-scan audit over the BANKED (unregistered) operator forms
— tools/scan_audit.py's signature logic applied before registration.

Catalyst re-inlines repeated DataFrame references, so an operator's
values can be differential-green while its executed plan re-reads the
corpus once per consumer (the r11 doremi lesson; this harness caught
cross_source_best_match at 16x corpus text scans at banking time).
Run after banking any new operator:

    python tools/bank_scan_audit.py [sf_dir]

Exit code 0 always (advisory); FLAG lines are the work list. The
PLANS.md late-bank audit section records the by-design remainders
(the exact-pair-engine two-pass shape)."""
import collections
import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
EXPENSIVE = ("text:string", "embedding")

spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

from hummingbirddatapipeline_spark.tables import load
from hummingbirddatapipeline_spark.operators.tokenization import (
    vocab_coverage, pack_length_groups, pack_concat_manifest,
    heaps_vocab_growth, length_profile_by_source)
from hummingbirddatapipeline_spark.operators.retrieval import (
    ngram_novelty, quality_borda, pmi_collocations, source_unigram_kl,
    source_signature_ngrams)
from hummingbirddatapipeline_spark.operators.dedup import (
    minhash_estimate_pairs, lsh_recall_report, lsh_candidate_profile,
    countmin_error_report, hll_error_report, source_overlap_matrix,
    cross_source_best_match, jaccard_pairs_all, jaccard_pairs_prefix)
from hummingbirddatapipeline_spark.operators.evaluation import gate_agreement_kappa
from hummingbirddatapipeline_spark.operators.expectations import embedding_coverage
from hummingbirddatapipeline_spark.operators.similarity import (
    embedding_source_profile, centroid_drift_by_source)
from hummingbirddatapipeline_spark.operators.temporal import gap_report
from hummingbirddatapipeline_spark.operators.windows import mad_anomaly_hours
from hummingbirddatapipeline_spark.operators.contamination import bloom_fpr_report
from hummingbirddatapipeline_spark.operators.graph import cluster_cohesion
from hummingbirddatapipeline_spark.operators.sampling import priority_weighted_sample
from hummingbirddatapipeline_spark.multimodal.core import (
    patch_plan, synth_media_from_documents)
from hummingbirddatapipeline_spark.catalog.relational import (
    q14_promo_effect, q19_bracket_revenue)
from hummingbirddatapipeline_spark.catalog.events_q import _with_ts_ms

docs = load(spark, SF, "documents")
vecs = load(spark, SF, "embeddings")
ev = _with_ts_ms(load(spark, SF, "events"))
sub = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
pairs = jaccard_pairs_all(sub, "text", "doc_id", 0.3, 1).select("id_a", "id_b")

PLANS = {
    "vocab_coverage": vocab_coverage(docs),
    "pack_length_groups": pack_length_groups(docs),
    "pack_concat_manifest": pack_concat_manifest(docs),
    "heaps_vocab_growth": heaps_vocab_growth(docs),
    "length_profile": length_profile_by_source(docs),
    "ngram_novelty": ngram_novelty(docs),
    "quality_borda": quality_borda(docs),
    "pmi_collocations": pmi_collocations(docs),
    "source_unigram_kl": source_unigram_kl(docs),
    "source_signature_ngrams": source_signature_ngrams(docs),
    "minhash_estimate": minhash_estimate_pairs(sub, pairs),
    "lsh_recall": lsh_recall_report(sub),
    "lsh_candidate_profile": lsh_candidate_profile(sub),
    "countmin_error": countmin_error_report(docs),
    "hll_error": hll_error_report(docs),
    "source_overlap": source_overlap_matrix(docs),
    "best_match": cross_source_best_match(sub.join(docs.select("doc_id","source"), "doc_id")),
    "gate_kappa": gate_agreement_kappa(docs),
    "embedding_coverage": embedding_coverage(docs, vecs),
    "source_profile": embedding_source_profile(vecs, docs),
    "centroid_drift": centroid_drift_by_source(vecs, docs),
    "gap_report": gap_report(load(spark, SF, "events")),
    "mad_anomaly": mad_anomaly_hours(ev, key_col="event_type"),
    "bloom_fpr": bloom_fpr_report(docs),
    "cluster_cohesion": cluster_cohesion(jaccard_pairs_prefix(docs, "text", "doc_id", 0.85, 1)),
    "priority_sample": priority_weighted_sample(docs),
    "patch_plan": patch_plan(synth_media_from_documents(docs)),
    "q14": q14_promo_effect(spark, SF),
    "q19": q19_bracket_revenue(spark, SF),
}

n_flagged = 0
for name, df in PLANS.items():
    plan = df._jdf.queryExecution().explainString(mode)
    sigs, loc, pf = [], "?", ""
    for s in re.findall(r"Location:[^\n]*|PushedFilters: [^\n]*|ReadSchema: [^\n]*", plan):
        if s.startswith("Location"):
            loc, pf = s, ""
        elif s.startswith("PushedFilters"):
            pf = s
        else:
            sigs.append((loc, pf, s))
    dups = {k: v for k, v in collections.Counter(sigs).items()
            if v >= 2 and any(m in k[2] for m in EXPENSIVE)}
    if dups:
        n_flagged += 1
        detail = ", ".join(f"{v}x {k[2][:60]}" for k, v in sorted(dups.items()))
        print(f"FLAG {name}: {detail}")
    else:
        print(f"ok   {name}")
print(f"\n{n_flagged} flagged of {len(PLANS)}")
spark.stop()
