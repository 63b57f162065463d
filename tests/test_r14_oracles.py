"""Differential (DuckDB) checks for the operators banked for round-14
catalog registration — maximal duplicated-span extraction (the
actionable completion of the Lee et al. substring-dedup family),
CCNet per-language perplexity bucketing, and Matryoshka truncation
recall — run on the real testdata exactly the way the catalog oracle
gate would. Each DuckDB side is an independent formulation: the span
oracle re-derives stride-1 windows, corpus occurrence counts, and the
LAG/running-sum island merge; the bucket oracle rebuilds the
interpolated bigram LM from scratch and re-ranks with PERCENT_RANK;
the matryoshka oracle re-ranks full AND truncated exact cosine top-k
from the raw embeddings and recounts the overlap."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

# BANK_SF_DIR lets the registration dry-run re-check every banked
# differential at the driver gate's scale (sf0.01) without
# duplicating the Spark-side builders
SF = os.environ.get("BANK_SF_DIR", "/root/testdata/sf0.001")


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
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


def _run_pair(spark, name, duck=None):
    """Differential through catalog.resolve_pair — the exact
    registration code; promoting the tier to @query changes nothing."""
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = duck() if duck else _duck()
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


def test_dup_spans_matches_duckdb(spark):
    got, exp = _run_pair(spark, "text_dup_spans")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # per-doc structural invariants: span_seq is 1..m in start order,
    # spans are separated by gaps > k (else they would have merged),
    # and every span covers at least one full window
    per_doc = {}
    for doc_id, seq, start, ln, nw in got:
        per_doc.setdefault(doc_id, []).append((seq, start, ln, nw))
    for doc_id, spans in per_doc.items():
        spans.sort(key=lambda s: s[1])
        assert [s[0] for s in spans] == list(range(1, len(spans) + 1))
        for (s1, st1, l1, _), (s2, st2, _, _) in zip(spans, spans[1:]):
            assert st2 - (st1 + l1 - 20) > 20  # break rule: gap > k
        for _, _, ln, nw in spans:
            assert ln >= 20 and nw >= 1


def test_dup_spans_recovers_planted_block(spark):
    """Constructive contract: a 40-token block pasted into 8 documents
    after a unique 30-token head is recovered as EXACTLY the
    [30, 70) span in every host — correct offsets, correct length,
    merged into one maximal span."""
    from hummingbirddatapipeline_spark.operators.dedup import (
        dup_span_extract,
    )

    block = " ".join(f"boiler{i}" for i in range(40))
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(30)) + " " + block)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [tuple(r) for r in dup_span_extract(df, k=20).collect()]
    assert len(out) == 8
    for doc_id, seq, start, ln, nw in out:
        assert seq == 1
        assert start == 30
        assert ln == 40
        assert nw == 21  # starts 30..50 inclusive


def test_perplexity_buckets_matches_duckdb(spark):
    got, exp = _run_pair(spark, "text_perplexity_buckets")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # every doc is bucketed, and within each language the thirds are
    # balanced to within one doc (percent_rank arithmetic)
    from collections import Counter

    assert len(got) == _docs(spark).count()
    per_lang = {}
    for _id, lang, _nb, nll, bucket in got:
        if bucket != "none":
            per_lang.setdefault(lang, Counter())[bucket] += 1
    assert per_lang
    for lang, c in per_lang.items():
        assert set(c) <= {"head", "middle", "tail"}
        if sum(c.values()) >= 3:
            assert max(c.values()) - min(c.values()) <= 2


def _duck_emb():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'embeddings.parquet')}')"
    )
    return con


def test_matryoshka_recall_matches_duckdb(spark):
    got, exp = _run_pair(spark, "similarity_matryoshka_recall", duck=_duck_emb)
    assert len(got) == len(exp) == 10  # 5 queries x 2 dims
    assert _norm(got) == _norm(exp)
    # fidelity must not decrease with a longer prefix on average, and
    # the truncated screen is lossy-but-useful on random embeddings
    mean = {
        d: sum(r[3] for r in got if r[1] == d) / 5 for d in (16, 64)
    }
    assert 0.0 < mean[16] <= mean[64] <= 1.0
    for _q, _d, n, rec in got:
        assert 0 <= n <= 10 and abs(rec - n / 10) < 1e-9
