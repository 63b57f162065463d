"""Edge-input battery for the late-bank operators (r22-r31): every
operator must survive (a) an EMPTY corpus, (b) an all-empty-text
corpus, and (c) a single pathologically long document — returning
empty/zero-shaped results, never raising and never going quadratic.
The r10 ADVICE round found exactly this class of bug (funnel stage
sums returning NULL on empty input); this file closes it for the
whole late bank up front."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def _empty(spark):
    return spark.createDataFrame([], _DOC_SCHEMA)


def _blank(spark):
    return spark.createDataFrame(
        [(1, "", "s1"), (2, "   ", "s2")], _DOC_SCHEMA
    )


def _giant(spark):
    # 100k tokens, ~50 distinct words: per-row HOF work stays k*n,
    # never n^2 in the token count
    text = " ".join(f"w{i % 50}" for i in range(100_000))
    return spark.createDataFrame([(1, text, "s1")], _DOC_SCHEMA)


def test_tokenization_ops_edge_inputs(spark):
    from hummingbirddatapipeline_spark.operators.tokenization import (
        heaps_vocab_growth,
        length_profile_by_source,
        pack_concat_manifest,
        pack_length_groups,
        vocab_coverage,
    )

    for docs in (_empty(spark), _blank(spark)):
        assert pack_concat_manifest(docs).count() == 0  # empties drop
        rows = vocab_coverage(docs, (4, 16)).collect()
        assert len(rows) == 2
        for r in rows:
            assert r["n_types"] == 0 and r["coverage"] == 0.0
        # length groups: blank docs have 0 tokens -> bin 0 batches
        pack_length_groups(docs).collect()
        length_profile_by_source(docs).collect()
        growth = heaps_vocab_growth(docs, (0.5, 1.0)).collect()
        for g in growth:
            assert g["n_types"] == 0 and g["type_token_ratio"] == 0.0

    giant = _giant(spark)
    assert pack_concat_manifest(giant, seq_len=128).collect()[0][
        "n_tokens"
    ] == 100_000
    cov = {r["vocab_size"]: r for r in vocab_coverage(giant, (50,)).collect()}
    assert cov[50]["coverage"] == 1.0 and cov[50]["n_types"] == 50


def test_retrieval_ops_edge_inputs(spark):
    from hummingbirddatapipeline_spark.operators.retrieval import (
        ngram_novelty,
        pmi_collocations,
        quality_borda,
        source_signature_ngrams,
        source_unigram_kl,
    )

    empty = _empty(spark)
    assert ngram_novelty(empty).count() == 0
    assert pmi_collocations(empty).count() == 0
    assert quality_borda(empty).count() == 0
    assert source_unigram_kl(empty).count() == 0
    assert source_signature_ngrams(empty).count() == 0

    blank = _blank(spark)
    nov = {r["doc_id"]: r for r in ngram_novelty(blank).collect()}
    assert nov[1]["n_grams"] == 0 and nov[1]["novelty_frac"] == 0.0
    borda = {r["doc_id"]: r for r in quality_borda(blank).collect()}
    assert borda[1]["r_quality"] == 1  # sole doc in its source
    assert source_unigram_kl(blank).count() == 0  # no tokens at all
    assert pmi_collocations(blank).count() == 0

    giant = _giant(spark)
    top = pmi_collocations(giant, min_count=2, k=5).collect()
    assert 0 < len(top) <= 5
    kl = source_unigram_kl(giant).collect()
    assert kl[0]["n_tokens"] == 100_000 and kl[0]["kl_e9"] == 0


def test_dedup_sketch_ops_edge_inputs(spark):
    from hummingbirddatapipeline_spark.operators.dedup import (
        countmin_error_report,
        cross_source_best_match,
        hll_error_report,
        lsh_candidate_profile,
        lsh_recall_report,
        source_overlap_matrix,
    )

    for docs in (_empty(spark), _blank(spark)):
        assert countmin_error_report(docs).count() == 0
        assert lsh_recall_report(docs).count() == 0
        assert lsh_candidate_profile(docs).count() == 0
        assert source_overlap_matrix(docs).count() == 0
        assert cross_source_best_match(docs).count() == 0
        hll = hll_error_report(docs).collect()
        # zero distinct words: estimate 0, rel_err guarded (n=0 ->
        # no row is also acceptable; pin whichever holds)
        assert len(hll) <= 1
        if hll:
            assert hll[0]["n_exact"] == 0

    giant = _giant(spark)
    r = hll_error_report(giant).collect()[0]
    assert r["n_exact"] == 50
    cm = countmin_error_report(giant, top=5).collect()
    assert all(x["exact_count"] == 2000 for x in cm)


def test_misc_ops_edge_inputs(spark):
    from hummingbirddatapipeline_spark.functions.text import char_entropy
    from hummingbirddatapipeline_spark.operators.contamination import (
        bloom_fpr_report,
    )
    from hummingbirddatapipeline_spark.operators.evaluation import (
        gate_agreement_kappa,
    )
    from hummingbirddatapipeline_spark.operators.expectations import (
        embedding_coverage,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        cluster_cohesion,
    )
    from hummingbirddatapipeline_spark.operators.sampling import (
        priority_weighted_sample,
    )
    from hummingbirddatapipeline_spark.operators.similarity import (
        centroid_drift_by_source,
        embedding_source_profile,
    )

    empty = _empty(spark)
    blank = _blank(spark)
    assert gate_agreement_kappa(empty).count() == 0
    k = {r["source"]: r for r in gate_agreement_kappa(blank).collect()}
    assert k["s1"]["n00"] == 1 and k["s1"]["kappa"] == 1.0  # pe=1 stratum

    fpr = bloom_fpr_report(empty).collect()[0]
    assert fpr["n_members"] == 0 and fpr["fpr"] == 0.0

    ent = blank.select(char_entropy(F.col("text")).alias("e")).collect()
    assert all(r["e"] == 0.0 for r in ent)

    empty_pairs = spark.createDataFrame(
        [], "id_a long, id_b long, jaccard double"
    )
    assert cluster_cohesion(empty_pairs).count() == 0

    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert embedding_source_profile(empty_vecs, empty).count() == 0
    assert centroid_drift_by_source(empty_vecs, empty).count() == 0
    cov = embedding_coverage(empty, empty_vecs)
    assert cov.count() == 0

    assert priority_weighted_sample(
        empty.withColumn("n_chars", F.lit(1).cast("long"))
    ).count() == 0


def test_temporal_windows_edge_inputs(spark):
    from hummingbirddatapipeline_spark.operators.temporal import gap_report
    from hummingbirddatapipeline_spark.operators.windows import (
        mad_anomaly_hours,
    )

    empty_ev = spark.createDataFrame([], "user_id long, ts_ms long")
    assert gap_report(empty_ev, ts_col="ts_ms").count() == 0
    assert mad_anomaly_hours(empty_ev).count() == 0

    # single event per user: no lag partner, no gaps; one hour ->
    # MAD undefined-as-0 -> nothing flags
    one = spark.createDataFrame([(1, 0), (2, 999)], "user_id long, ts_ms long")
    assert gap_report(one, ts_col="ts_ms").count() == 0
    assert mad_anomaly_hours(one).count() == 0


def test_multimodal_relational_edge_inputs(spark):
    from pyspark.sql.types import IntegerType

    from hummingbirddatapipeline_spark.multimodal.core import patch_plan

    meta = StructType(
        [
            StructField("kind", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    schema = StructType(
        [StructField("media_id", LongType()), StructField("media_meta", meta)]
    )
    empty_media = spark.createDataFrame([], schema)
    assert patch_plan(empty_media).count() == 0
    with pytest.raises(ValueError):
        patch_plan(empty_media, patch=0)


def test_midbank_ops_empty_inputs(spark):
    """The same empty-corpus battery over the r13-r21 mid-bank
    operators (they register soonest — an empty-input crash at
    registration time burns a window slot): each must return an
    empty/zero-shaped frame, never raise."""
    from pyspark.sql.types import DoubleType, IntegerType

    from hummingbirddatapipeline_spark.operators.dedup import (
        boilerplate_leaderboard,
        cross_source_dup_matrix,
        cut_dup_spans,
        dup_span_extract,
        strip_boilerplate_chunks,
    )
    from hummingbirddatapipeline_spark.operators.evaluation import (
        auc_by_group,
        calibration_bins,
        hash_ngram_features,
    )
    from hummingbirddatapipeline_spark.operators.graph import (
        cluster_size_histogram,
    )
    from hummingbirddatapipeline_spark.operators.retrieval import (
        perplexity_buckets,
        tfidf_keywords,
        trigram_logprob_heldout,
    )
    from hummingbirddatapipeline_spark.operators.sampling import (
        epoch_plan,
        unimax_allocation,
    )
    from hummingbirddatapipeline_spark.operators.scale import (
        rendezvous_shards,
    )
    from hummingbirddatapipeline_spark.operators.tokenization import (
        bpe_fertility_by_lang,
    )

    empty_docs = spark.createDataFrame(
        [],
        "doc_id long, text string, source string, lang string, "
        "n_chars long",
    )
    assert strip_boilerplate_chunks(empty_docs).count() == 0
    assert dup_span_extract(empty_docs).count() == 0
    assert cut_dup_spans(empty_docs).count() == 0
    assert boilerplate_leaderboard(empty_docs).count() == 0
    assert tfidf_keywords(empty_docs).count() == 0
    assert perplexity_buckets(empty_docs).count() == 0
    assert trigram_logprob_heldout(empty_docs).count() == 0
    assert hash_ngram_features(empty_docs).count() == 0
    assert unimax_allocation(empty_docs, 1000).count() == 0
    # epoch_plan's documented contract: a budget no language can fund
    # fails LOUDLY (a planner returning an empty plan would silently
    # under-train) — pin the error, not an empty frame
    with pytest.raises(ValueError, match="funds no language"):
        epoch_plan(empty_docs, 1000).count()
    assert rendezvous_shards(empty_docs, "doc_id", 8).count() == 0
    assert bpe_fertility_by_lang(empty_docs, []).count() == 0

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    empty_meta = spark.createDataFrame([], "doc_id long, source string")
    assert (
        cross_source_dup_matrix(empty_pairs, empty_meta).count() == 0
    )
    # histogram over an empty graph with an empty universe: no rows
    assert (
        cluster_size_histogram(empty_pairs, universe=empty_meta).count()
        == 0
    )

    empty_scored = spark.createDataFrame(
        [], "doc_id long, score double, label int, source string"
    )
    assert auc_by_group(empty_scored).count() == 0
    assert calibration_bins(empty_scored).count() == 0
