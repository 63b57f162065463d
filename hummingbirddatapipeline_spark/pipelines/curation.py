"""Training-corpus curation pipeline (north-star composite): the
standard LLM-data funnel — metadata/language filter -> heuristic
quality gate -> exact dedup -> near-dup dedup -> clean corpus + a
per-stage attrition report.

Composes the engine's text/dedup operators into one job; every stage
is native expressions, and the stats funnel is DuckDB-oracled through
the catalog (curation_funnel). At 100 TB the near-dup stage swaps the
exact inverted-index join for the MinHash-LSH path
(operators.dedup.near_dup_pairs_minhash) — same drop rule, bounded
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.functions.text import fingerprint, quality_score
from hummingbirddatapipeline_spark.operators.dedup import (
    jaccard_pairs_prefix,
    near_dup_pairs_minhash,
)


def curate_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.85,
    use_lsh: bool = False,
    use_clusters: bool = False,
    max_top_gram_char_frac: float | None = None,
    nll_band: tuple[float, float] | None = None,
    precomputed_pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_corpus, funnel_stats).

    Stages: language whitelist -> quality gate -> exact dedup on the
    normalized-text fingerprint (keep lowest doc_id) -> near-dup drop
    (for each pair over the Jaccard threshold, drop the higher id —
    the greedy keep-first rule). ``use_lsh`` switches the pair
    generator to MinHash-LSH for scale.

    ``use_clusters=True`` replaces the greedy drop with connected-
    components dedup (operators.graph): pairs close into clusters and
    exactly the min-id representative of each cluster survives. The
    greedy rule under-drops transitive chains — a doc whose every edge
    points at a LARGER id is never an id_b, so it survives even though
    it is (transitively) a near-dup of the cluster representative;
    clustering drops it. Costs O(log n) extra shuffle rounds.

    ``max_top_gram_char_frac`` (e.g. the Gopher 2-gram threshold 0.20)
    inserts a repetition gate after the quality gate: docs whose top
    word-2-gram covers more than that fraction of characters are
    dropped (functions.text.repetition_stats), adding a
    ``repetition_kept`` funnel stage.

    ``nll_band=(lo, hi)`` inserts the perplexity-filter shape (CCNet
    "keep the middle" rule) after the repetition gate: docs whose mean
    corpus-unigram surprisal (operators.retrieval.unigram_logprob,
    scored against the FULL input corpus so the reference distribution
    is gate-independent) falls outside the band are dropped — too low
    is boilerplate, too high is noise. Adds an ``nll_kept`` stage.

    ``precomputed_pairs`` reuses an existing near-dup pair set for the
    WHOLE corpus (e.g. dedup_q.shared_jaccard_pairs) instead of
    re-running pair generation on the gated survivors. Sound because
    pairwise Jaccard is pair-local: the pair set of a subset equals
    the full pair set restricted to pairs whose BOTH endpoints
    survive — which is exactly the semi-join applied here. The caller
    must ensure the precomputed set used the same threshold and
    shingling as this funnel's near-dup stage.
    """
    total = docs.select(F.count("*").alias("n")).withColumn("stage", F.lit("input"))

    lang_kept = docs.filter(F.col("lang").isin(list(langs)))
    quality_kept = lang_kept.filter(
        F.round(quality_score(F.col("text")), 2) >= min_quality
    )

    gated = quality_kept
    rep_stage: list[tuple[str, DataFrame]] = []
    if max_top_gram_char_frac is not None:
        from hummingbirddatapipeline_spark.functions.text import (
            repetition_stats,
        )

        keep = repetition_stats(quality_kept, "text", "doc_id").filter(
            F.col("top_gram_char_frac") <= max_top_gram_char_frac
        )
        gated = quality_kept.join(keep.select("doc_id"), "doc_id", "left_semi")
        rep_stage = [("repetition_kept", gated)]

    nll_stage: list[tuple[str, DataFrame]] = []
    if nll_band is not None:
        from hummingbirddatapipeline_spark.operators.retrieval import (
            unigram_logprob,
        )

        lo, hi = nll_band
        nll_keep = unigram_logprob(docs).filter(
            F.col("mean_nll").between(F.lit(lo), F.lit(hi))
        )
        gated = gated.join(nll_keep.select("doc_id"), "doc_id", "left_semi")
        nll_stage = [("nll_kept", gated)]

    fp = gated.withColumn("__fp", fingerprint(F.col("text")))
    keeper = fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    exact_kept = fp.join(keeper, ["__fp", "doc_id"], "left_semi").drop("__fp")

    if precomputed_pairs is not None:
        ids = exact_kept.select("doc_id")
        pairs = (
            precomputed_pairs.join(
                ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
            ).join(ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
        )
    else:
        pair_fn = near_dup_pairs_minhash if use_lsh else jaccard_pairs_prefix
        pairs = pair_fn(
            exact_kept, "text", "doc_id",
            threshold=jaccard_threshold, shingle_size=1,
        )
    if use_clusters:
        from hummingbirddatapipeline_spark.operators.graph import (
            dedup_representatives,
        )

        clean = dedup_representatives(exact_kept, pairs, id_col="doc_id")
    else:
        drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        clean = exact_kept.join(drops, "doc_id", "left_anti")

    stats = total
    for stage, df in (
        ("lang_kept", lang_kept),
        ("quality_kept", quality_kept),
        *rep_stage,
        *nll_stage,
        ("exact_deduped", exact_kept),
        ("near_deduped", clean),
    ):
        stats = stats.unionByName(
            df.select(F.count("*").alias("n")).withColumn("stage", F.lit(stage))
        )
    return clean, stats.select("stage", "n")


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-source dataset card — the summary table a corpus release
    ships with (datasheet/data-card practice; Gebru et al. 2021): doc
    and token volume, mean heuristic quality, language spread (distinct
    langs + Shannon entropy of the language mix), and the exact-dup
    rate (1 - distinct fingerprints / docs).

    Plan: one scan computes quality/token/fingerprint columns, then two
    hash aggregates keyed on source and (source, lang) — both map-side
    combined; the per-source table (thousands of rows at worst) joins
    back broadcast. Cross-engine determinism: all counts stay exact
    BIGINTs; only the final ratios divide, and entropy/mean-quality are
    rounded (6dp/4dp) against summation-order drift.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    base = docs.select(
        "source",
        "lang",
        F.round(quality_score(F.col("text")), 2).alias("q"),
        ws_token_count(F.col("text")).cast("long").alias("n_tok"),
        fingerprint(F.col("text")).alias("f"),
    )
    per_src = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("q"), 4).alias("mean_quality"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("f").alias("n_unique"),
    )
    # Shannon entropy via H = ln(n) - sum(c * ln c) / n: algebraically
    # identical to -sum(p ln p) but needs only the (source, lang)
    # counts — no join back to the per-source totals, so the heavy
    # quality/fingerprint branch is computed exactly once
    lc = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    c_d = F.col("c").cast("double")
    ent = lc.groupBy("source").agg(
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(c_d * F.log(c_d)) / F.sum("c").cast("double"),
            6,
        ).alias("lang_entropy")
    )
    return (
        per_src.join(ent, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "mean_quality",
            "n_langs",
            F.round(
                F.lit(1.0)
                - F.col("n_unique").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            "lang_entropy",
        )
    )


def source_gate(
    docs: DataFrame,
    pairs: DataFrame,
    min_mean_quality: float = 0.87,
    max_near_dup_frac: float = 0.80,
) -> tuple[DataFrame, DataFrame]:
    """Domain-level curation gate (the FineWeb/RefinedWeb move): score
    each SOURCE by its aggregate signals — mean heuristic quality and
    the fraction of its docs involved in near-dup pairs — and drop
    whole sources below the bar, on the logic that a domain that is
    mostly boilerplate or cross-duplicated is bad at the domain level,
    not per-document.

    ``pairs`` is the corpus near-dup edge list (id_a, id_b) from any
    generator (exact Jaccard, MinHash-LSH). Returns (kept_docs,
    verdicts) where verdicts is one row per source: (source, n_docs,
    mean_quality, near_dup_frac, kept).

    Plan: near-dup membership is a distinct over the pair endpoints
    (skinny ids-only shuffle), one per-source aggregate, and the
    surviving-source set — tiny by construction — broadcasts back as a
    semi-join filter on the corpus scan. Counts stay exact BIGINTs so
    both engines evaluate identical ratio doubles.
    """
    nd_docs = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__nd", F.lit(1).cast("long"))
    )
    base = docs.select(
        "doc_id", "source", F.round(quality_score(F.col("text")), 2).alias("q")
    )
    verdicts = (
        base.join(nd_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 4).alias("mean_quality"),
            F.round(
                F.sum(F.coalesce(F.col("__nd"), F.lit(0))).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("near_dup_frac"),
        )
        .withColumn(
            "kept",
            (F.col("mean_quality") >= min_mean_quality)
            & (F.col("near_dup_frac") <= max_near_dup_frac),
        )
    )
    kept_docs = docs.join(
        F.broadcast(verdicts.filter(F.col("kept")).select("source")),
        "source",
        "left_semi",
    )
    return kept_docs, verdicts
