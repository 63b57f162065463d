"""Differential (DuckDB) checks for the operators banked for round-17
catalog registration — the in-engine model-EVALUATION completion of
the classifier lifecycle (features -> train -> calibrate -> score):
exact tie-aware ROC-AUC per source, reliability-diagram calibration
bins over the in-engine logistic model, and the hashing-trick n-gram
featurizer. Each DuckDB side is an independent formulation: the AUC
oracle re-derives tie-aware rank sums as pure integers; the
calibration oracle nests the FULL unrolled logreg training trajectory
and re-bins; the featurizer oracle rebuilds the namespaced gram
stream and 52-bit-md5 buckets from raw text."""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def _student_scored(spark):
    from hummingbirddatapipeline_spark.functions.text import (
        quality_score,
        ws_token_count,
    )

    docs = _docs(spark)
    cnt = ws_token_count(F.col("text"))
    score = F.round(
        F.col("n_chars")
        / F.when(cnt == 0, F.lit(None)).otherwise(cnt),
        6,
    )
    return docs.select(
        "source",
        score.alias("score"),
        (F.round(quality_score(F.col("text")), 2) >= 0.9).alias("y"),
    ).filter(F.col("score").isNotNull())


def _run_pair(spark, name):
    """Differential through catalog.resolve_pair — the exact
    registration code; promoting the tier to @query changes nothing."""
    from hummingbirddatapipeline_spark.catalog import resolve_pair

    fn, sql = resolve_pair(name)
    got = [tuple(r) for r in fn(spark, SF).collect()]
    con = _duck()
    exp = con.sql(sql).fetchall()
    con.close()
    return got, exp


def test_auc_by_source_matches_duckdb(spark):
    got, exp = _run_pair(spark, "eval_auc_by_source")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    for _g, p, n, auc in got:
        if p > 0 and n > 0:
            assert 0.0 <= auc <= 1.0


def test_auc_flip_symmetry_and_perfect_separation(spark):
    """Rank-statistic contracts: flipping every label maps AUC to
    1 - AUC (tie-aware Mann-Whitney identity), and a perfectly
    separated fixture scores exactly 1.0 / an all-tied fixture exactly
    0.5 (the tie credit)."""
    from hummingbirddatapipeline_spark.operators.evaluation import (
        auc_by_group,
    )

    scored = _student_scored(spark)
    fwd = {
        r["group"]: r["auc"]
        for r in auc_by_group(scored, "score", "y", "source").collect()
    }
    rev = {
        r["group"]: r["auc"]
        for r in auc_by_group(
            scored.select("source", "score", (~F.col("y")).alias("y")),
            "score",
            "y",
            "source",
        ).collect()
    }
    checked = 0
    for g, a in fwd.items():
        if a is not None and rev.get(g) is not None:
            assert abs((1.0 - a) - rev[g]) <= 2e-6
            checked += 1
    assert checked > 0
    rows = [("g", float(i), i >= 5) for i in range(10)] + [
        ("t", 1.0, i % 2 == 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "source string, score double, y boolean")
    out = {
        r["group"]: r["auc"]
        for r in auc_by_group(df, "score", "y", "source").collect()
    }
    assert out["g"] == 1.0  # perfect separation
    assert out["t"] == 0.5  # all ties -> pure tie credit


def test_calibration_bins_matches_duckdb(spark):
    got, exp = _run_pair(spark, "eval_calibration_bins")
    assert len(got) == len(exp) > 1
    assert _norm(got) == _norm(exp)
    assert sum(r[1] for r in got) == _docs(spark).count()
    for b, n, npos, mp, fp in got:
        assert 0 <= b <= 9 and 0 <= npos <= n
        assert 0.0 <= mp <= 1.0 and 0.0 <= fp <= 1.0


def test_hash_ngram_features_matches_duckdb(spark):
    got, exp = _run_pair(spark, "feature_hash_ngrams")
    assert len(got) == len(exp) > 0
    assert _norm(got) == _norm(exp)
    # conservation: bucket counts must add up to the exact gram count
    # (tokens + bigrams), and indexes stay inside the table
    import duckdb as d2

    con = _duck()
    n_grams = con.sql(
        "SELECT SUM(len(list_filter(string_split_regex(lower(trim(text)),"
        " '\\s+'), t -> t <> ''))) + SUM(GREATEST(len(list_filter("
        "string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')) - 1,"
        " 0)) FROM documents"
    ).fetchone()[0]
    con.close()
    assert sum(r[2] for r in got) == n_grams
    assert all(0 <= r[1] < 256 for r in got)
