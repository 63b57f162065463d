"""Differential (DuckDB) checks for the operators banked for round-13
catalog registration — the Bloom-filter decontamination screen, CCNet
chunk-level boilerplate removal, and in-engine logistic-regression
quality-classifier training — run on the real testdata exactly the way
the catalog oracle gate would, so r13 registration is a window change,
not new work. Each DuckDB side is an independent formulation per the
repo's differential rule: the Bloom oracle re-folds the 52-bit-md5
positions into 63-bit words with bit_or and replays the shift/AND
probe; the boilerplate oracle re-derives the CDC chunk stream and the
frequency rule; the logreg oracle unrolls every gradient-descent
iteration as chained CTEs over the rational-sigmoid link."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

# BANK_SF_DIR lets the registration dry-run re-check every banked
# differential at the driver gate's scale (sf0.01) without
# duplicating the Spark-side builders
SF = os.environ.get("BANK_SF_DIR", "/root/testdata/sf0.001")


def _duck(*tables: str):
    con = duckdb.connect()
    for t in tables or ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                v.hex() if isinstance(v, float) and not math.isnan(v) else v
                for v in r
            )
        )
    return sorted(out, key=repr)


def _docs(spark):
    from hummingbirddatapipeline_spark.tables import load

    return load(spark, SF, "documents")


def _run_pair(spark, name, *tables):
    """(spark rows, oracle rows) for a registered-or-banked row: the
    differential drives the EXACT registration code via
    catalog.resolve_pair, so promoting the tier from @banked_query to
    @query changes nothing here."""
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = _duck(*tables)
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


# ---------------------------------------------------------------- bloom


def test_bloom_screen_matches_duckdb(spark):
    got, exp = _run_pair(spark, "curation_bloom_screen")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # at the registration sizing (2 KB filter vs ~1k bench grams) the
    # screen FIRES but does not saturate: some pass, most are cut
    n_scr = sum(1 for r in got if r[3])
    assert 0 < n_scr < len(got) // 2


def test_bloom_screen_never_misses_exact_hits(spark):
    """The screen contract: bloom_gram_screen flags a SUPERSET of
    ngram_contamination's exact collisions — at ANY filter size, every
    set position of a benchmark gram is set by construction, so a
    false negative is impossible; shrinking the filter only ever ADDS
    false positives."""
    from hummingbirddatapipeline_spark.operators.contamination import (
        bloom_gram_screen,
        ngram_contamination,
    )

    docs = _docs(spark).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    exact = {
        r["doc_id"]
        for r in ngram_contamination(train, bench, n=5).collect()
        if r["contaminated"]
    }
    assert exact  # fixture must exercise the contract
    big = {
        r["doc_id"]: r["screened"]
        for r in bloom_gram_screen(
            train, bench, n=5, n_words=16, n_hashes=3
        ).collect()
    }
    # a deliberately tiny filter (2 words = 126 bits) saturates into
    # false positives but still cannot miss
    tiny = {
        r["doc_id"]: r["screened"]
        for r in bloom_gram_screen(
            train, bench, n=5, n_words=2, n_hashes=3
        ).collect()
    }
    for d in exact:
        assert big[d] and tiny[d]
    assert sum(tiny.values()) >= sum(big.values()) >= len(exact)


# ----------------------------------------------------- chunk boilerplate


def test_chunk_boilerplate_matches_duckdb(spark):
    got, exp = _run_pair(spark, "text_chunk_boilerplate")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # conservation: kept <= total tokens, dropped <= chunks; and the
    # rule fires on the fixture (near-dup docs share CDC chunks)
    for _id, n_c, n_d, n_t, n_k in got:
        assert 0 <= n_d <= n_c and 0 <= n_k <= n_t
    assert any(r[2] > 0 for r in got)


def test_chunk_boilerplate_drops_planted_shared_block(spark):
    """Constructive CCNet property: paste one shared block into many
    otherwise-distinct documents and the block's interior chunks are
    dropped from EVERY host, while each host's unique content is
    kept."""
    from hummingbirddatapipeline_spark.functions.text import cdc_chunks
    from hummingbirddatapipeline_spark.operators.dedup import (
        strip_boilerplate_chunks,
    )

    block = " ".join(f"boiler{i}" for i in range(40))
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(30)) + " " + block)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_chunks(df, max_docs=2).collect()
    }
    # the shared block spans >= 2 full chunks in at least one host, so
    # every host must drop >= 1 chunk yet keep >= 1 (its unique head)
    chunk_rows = df.select(
        "doc_id", F.explode(cdc_chunks(F.col("text"))).alias("c")
    ).collect()
    assert len(chunk_rows) > len(rows)
    for i in range(8):
        r = out[i]
        assert r["n_chunks_dropped"] >= 1
        assert r["n_chunks_dropped"] < r["n_chunks"]
        assert 0 < r["n_tokens_kept"] < r["n_tokens"]


# ----------------------------------------------------------- logreg GD


def test_logreg_quality_matches_duckdb(spark):
    got, exp = _run_pair(spark, "curation_logreg_train")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # the trained model actually separates: scores are not all equal,
    # and training agreement beats the untrained all-positive start
    # (w=0 scores everything 0.5 -> pred TRUE -> accuracy = pos rate)
    scores = {r[1] for r in got}
    assert len(scores) > 10
    acc = sum(1 for r in got if r[4]) / len(got)
    pos_rate = sum(1 for r in got if r[3]) / len(got)
    assert acc > pos_rate


def test_logreg_learns_separable_fixture(spark):
    """On a linearly separable synthetic set, a few GD steps reach
    high training accuracy — the trainer trains, not just runs."""
    from hummingbirddatapipeline_spark.pipelines.curation import (
        logreg_quality_train,
    )

    rows = [(i, i >= 50, float(i), float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id long, teacher_label boolean, fa double, fb double"
    )
    out = logreg_quality_train(
        df, ["fa", "fb"], lr=2.0, n_iter=8
    ).collect()
    acc = sum(1 for r in out if r["correct"]) / len(out)
    assert acc >= 0.9
