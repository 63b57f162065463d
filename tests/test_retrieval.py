"""Unit tests for the retrieval/scoring operators (BM25, unigram
surprisal, RRF fusion) — semantic properties on hand-built fixtures;
the catalog queries are additionally differentially tested against
DuckDB oracles (tools/check_oracle.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.operators.retrieval import (
    bm25_topk,
    rrf_fuse,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_tf_monotone_and_absent_docs_excluded(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha alpha beta gamma"),  # higher tf, same length
            (3, "beta gamma delta epsilon"),  # no query term
        ],
    )
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["alpha"], k=10).collect()}
    assert set(out) == {1, 2}  # doc 3 has no query term -> no row
    assert out[2]["score"] > out[1]["score"]
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2


def test_bm25_length_normalization(spark):
    # same tf=1; the longer doc scores lower (b > 0 length penalty)
    docs = _docs(
        spark,
        [
            (1, "alpha beta"),
            (2, "alpha beta " + "filler " * 30),
        ],
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["alpha"], k=10).collect()}
    assert out[1] > out[2]


def test_bm25_idf_favors_rare_terms(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4; a doc matching
    # only 'rare' must outrank a doc matching only 'common'.
    docs = _docs(
        spark,
        [
            (1, "common rare x y"),
            (2, "common a b c"),
            (3, "common d e f"),
            (4, "common g h i"),
        ],
    )
    scored = bm25_topk(docs, ["rare", "common"], k=10).collect()
    assert scored[0]["doc_id"] == 1  # rare-term doc on top


def test_unigram_logprob_uniform_corpus_is_flat(spark):
    # every token equally frequent -> every doc has mean_nll = ln(V)
    docs = _docs(spark, [(1, "a b"), (2, "c d"), (3, "e f")])
    rows = unigram_logprob(docs).collect()
    expect = round(math.log(6.0), 4)  # 6 distinct tokens, each p=1/6
    assert all(r["mean_nll"] == expect for r in rows)
    assert all(r["n_tokens"] == 2 for r in rows)


def test_unigram_logprob_rare_tokens_raise_surprisal(spark):
    docs = _docs(
        spark,
        [
            (1, "the the the the"),
            (2, "the the the zzz"),  # one rare token
            (3, "the the the the"),
        ],
    )
    out = {r["doc_id"]: r["mean_nll"] for r in unigram_logprob(docs).collect()}
    assert out[2] > out[1] == out[3]


def test_unigram_logprob_empty_doc_null_score(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "   ")])
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["mean_nll"] is None


def test_rrf_hand_computed(spark):
    r1 = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=10).collect()}
    assert out[20]["rrf_score"] == round(1 / 62 + 1 / 61, 6)  # both lists
    assert out[10]["rrf_score"] == round(1 / 61, 6)  # first list only
    assert out[30]["rrf_score"] == round(1 / 62, 6)  # second list only
    assert [out[i]["rank"] for i in (20, 10, 30)] == [1, 2, 3]


def test_rrf_tie_broken_by_id(spark):
    r1 = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(3, 1), (5, 2)], "doc_id long, rank int")
    rows = rrf_fuse([r1, r2], k=10).collect()
    # symmetric ranks -> equal scores; lower id first
    assert [r["doc_id"] for r in rows] == [3, 5]


def test_bm25_plan_has_no_cartesian_on_corpus(spark, sf_dir):
    """The only crossJoin is the single-row corpus-stats combine; the
    plan must not contain a row-by-row cartesian over documents."""
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    plan = bm25_topk(docs, ["hash", "join"], k=10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_bigram_logprob_hand_computed(spark):
    from hummingbirddatapipeline_spark.operators.retrieval import (
        bigram_logprob,
    )

    # corpus: uni a:3 b:2 T=5; bigrams (a,b):2 (b,a):1
    docs = _docs(spark, [(1, "a b"), (2, "a b a")])
    out = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.9).collect()}
    p_ab = 0.9 * 2 / 3 + 0.1 * 2 / 5
    p_ba = 0.9 * 1 / 2 + 0.1 * 3 / 5
    assert out[1]["n_bigrams"] == 1
    assert out[1]["mean_nll"] == round(-math.log(p_ab), 4)
    assert out[2]["n_bigrams"] == 2
    assert out[2]["mean_nll"] == round(
        (-math.log(p_ab) - math.log(p_ba)) / 2, 4
    )


def test_bigram_logprob_short_doc_is_null(spark):
    from hummingbirddatapipeline_spark.operators.retrieval import (
        bigram_logprob,
    )

    docs = _docs(spark, [(1, "solo"), (2, "two words")])
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["mean_nll"] is None
    assert out[2]["n_bigrams"] == 1 and out[2]["mean_nll"] is not None
