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
