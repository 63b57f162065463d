"""Unit tests for the round-6 corpus-level curation operators: the
per-source dataset card and the domain-level (source) gate. Catalog
forms are additionally DuckDB-oracled (corpus_stats_report,
curation_source_gate)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_corpus_stats_dup_rate_and_entropy(spark):
    from hummingbirddatapipeline_spark.pipelines.curation import corpus_stats

    docs = _docs(
        spark,
        [
            (1, "same text here", "en", "A"),
            (2, "same text here", "en", "A"),  # exact dup of 1
            (3, "one two three", "en", "B"),
            (4, "four five six", "fr", "B"),
        ],
    )
    out = {r["source"]: r for r in corpus_stats(docs).collect()}
    assert out["A"]["n_docs"] == 2 and out["A"]["dup_rate"] == 0.5
    assert out["A"]["n_langs"] == 1 and out["A"]["lang_entropy"] == 0.0
    assert out["B"]["dup_rate"] == 0.0
    assert out["B"]["n_langs"] == 2
    assert out["B"]["lang_entropy"] == round(math.log(2), 6)
    assert out["B"]["total_tokens"] == 6


def test_source_gate_drops_near_dup_heavy_source(spark):
    from hummingbirddatapipeline_spark.pipelines.curation import source_gate

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma", "en", "dupfarm"),
            (2, "alpha beta gamma", "en", "dupfarm"),
            (3, "clean unique text", "en", "good"),
            (4, "other clean words", "en", "good"),
        ],
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    kept, verdicts = source_gate(
        docs, pairs, min_mean_quality=0.0, max_near_dup_frac=0.5
    )
    v = {r["source"]: r for r in verdicts.collect()}
    assert v["dupfarm"]["near_dup_frac"] == 1.0 and not v["dupfarm"]["kept"]
    assert v["good"]["near_dup_frac"] == 0.0 and v["good"]["kept"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]


def test_c4_filters_flags(spark):
    from hummingbirddatapipeline_spark.catalog import text_q

    docs = spark.createDataFrame(
        [
            (1, "Lorem ipsum dolor sit amet etc."),
            (2, "function() { return 1; }"),
            (3, "A JavaScript tutorial for the web browser today."),
            (4, "too short"),
            (5, "This is a clean prose sentence with many words."),
            (6, "no terminal punctuation here at all words words"),
        ],
        "doc_id long, text string",
    )
    orig = text_q.load
    try:
        text_q.load = lambda s, d, n: docs  # noqa: ARG005
        out = {
            r["doc_id"]: r
            for r in text_q.text_c4_filters.__wrapped__(spark, "x").collect()
        }
    finally:
        text_q.load = orig
    assert out[1]["has_lorem"] and not out[1]["c4_keep"]
    assert out[2]["has_brace"] and not out[2]["c4_keep"]
    assert out[3]["has_javascript"] and not out[3]["c4_keep"]
    assert out[4]["n_words"] == 2 and not out[4]["c4_keep"]
    assert out[5]["c4_keep"] and out[5]["ends_terminal"]
    assert out[6]["c4_keep"] and not out[6]["ends_terminal"]
