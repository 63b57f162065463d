"""Repeated-scan audit with a BY_DESIGN classification table —
tools/scan_audit.py's signature logic plus the recorded
accepted-shape decisions.

Catalyst re-inlines repeated DataFrame references, so an operator's
values can be differential-green while its executed plan re-reads the
corpus once per consumer (the r11 doremi lesson; this harness caught
cross_source_best_match at 16x corpus text scans at banking time).

Historically this swept catalog.BANKED (the pre-staged registration
rows). Since r12 the bank is drained to zero, so the sweep now covers
QUERIES plus whatever BANKED holds (normally nothing) — same plans,
same fixtures.

    python tools/bank_scan_audit.py [sf_dir] [row_name ...]

Unknown row names exit 1 with a message before the sweep. Otherwise
exit code 0 always (advisory); FLAG lines are the work list. The
PLANS.md late-bank audit section records the by-design remainders
(the exact-pair-engine two-pass shape, stats-then-transform, the
two-pass corpus LMs)."""
import collections
import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])
EXPENSIVE = ("text:string", "embedding")

spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

from hummingbirddatapipeline_spark.catalog import BANKED, QUERIES  # noqa: E402

ROWS = {**QUERIES, **BANKED}

# Documented by-design repeated-scan shapes (same classes the
# registered-catalog scan audit accepts); a flag here prints
# "bydesign" with the reason instead of FLAG. Decisions recorded in
# the rows' docstrings / PLANS.md.
BY_DESIGN = {
    "dedup_lsh_recall": "exact-pair-engine self-join sides (the "
    "registered near-dup rows' accepted class); measurement is "
    "universe-bounded",
    "similarity_matryoshka_recall": "one cosine-topk pass per prefix "
    "dim — re-reading the pruned scan beats materializing a "
    "corpus-width copy (the hamming_topk stats-then-transform trade)",
    "text_bpe_fertility": "bpe_segment's dictionary-replay shape "
    "(unique-word table + posexplode re-attach) plus the word/char "
    "stats pass — the registered text_bpe_segment's accepted class",
    "text_trigram_logprob_heldout": "bi/tri count tables re-scan the "
    "pruned train text instead of materializing a tagged combined "
    "aggregate (near corpus-scale on Zipfian text; the bigram_logprob "
    "/ DSIR decline-record trade, A/B'd 2x slower cold at sf0.1 — "
    "PLANS.md); only the vocab-sized unigram table checkpoints",
    "text_cut_dup_spans": "the stride-1 window stream feeds the "
    "occurrence aggregate AND the cut join; at ~16 bytes per token "
    "position the stream outweighs the text, so re-scanning beats "
    "materializing (recorded decline, A/B'd at sf0.1 — PLANS.md)",
    # The entries below were classified when the audit first swept the
    # FULL registered catalog (r12) instead of only the bank: each is
    # an instance of an accepted class already recorded above or in
    # PLANS.md r10/r11 for a sibling row. All are 2x scans whose
    # second read is a distinct LOGICAL side, not a Catalyst re-inline.
    "curation_funnel": "one flags-frame pass (the r10 27->0 fix) plus "
    "the exact-pair-engine text pass — the funnel's near-dup stage "
    "necessarily reads the corpus once itself",
    "dedup_incremental_batch": "batch-vs-store semantics: the probe "
    "batch and the index store are distinct logical sides that the "
    "fixture derives from the same table",
    "sample_dsir_select": "DSIR's two LM sides (in-domain target vs "
    "corpus background) each count over text — the two-pass corpus-LM "
    "accepted class (the bigram_logprob decline-record trade)",
    "similarity_hamming_topk": "stats-then-transform: threshold stats "
    "pass then encode pass — documented by-design on the row since "
    "r11 registration",
    "similarity_lsh_topk": "items side and sampled-queries side each "
    "band the embeddings table — two logical sides of the top-k join",
    "similarity_near_dup_embeddings": "exact-pair self-join sides at "
    "the demo threshold (the brute escape hatch; the accepted class "
    "of dedup_lsh_recall above)",
    "text_bpe_segment": "dictionary-replay shape: unique-word table "
    "plus posexplode re-attach (named as this row's accepted class "
    "in the text_bpe_fertility entry above)",
    "text_jaccard_near_dups": "exact-pair self-join sides (the "
    "accepted near-dup pair-engine class)",
    "text_unigram_logprob": "two-pass corpus LM: count table plus "
    "scoring pass (the bigram_logprob accepted class)",
}

unknown = sorted(ONLY - set(ROWS))
if unknown:
    print(f"unknown row name(s): {unknown}")
    spark.stop()
    sys.exit(1)

n_flagged = 0
names = sorted(ONLY or ROWS)
for name in names:
    df = ROWS[name](spark, SF)
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
    if dups and name in BY_DESIGN:
        print(f"bydesign {name}: {BY_DESIGN[name]}")
    elif dups:
        n_flagged += 1
        detail = ", ".join(f"{v}x {k[2][:60]}" for k, v in sorted(dups.items()))
        print(f"FLAG {name}: {detail}")
    else:
        print(f"ok   {name}")
print(f"\n{n_flagged} flagged of {len(names)}")
spark.stop()
