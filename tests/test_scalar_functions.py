"""Unit tests for the scalar expression library (SURVEY.md §2.8),
including the F2 boundary matrix from SURVEY.md §5.2."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.functions.scalar import (
    bucket,
    clamp_min,
    flag_parse,
    hhi,
    linear_interp_score,
    normalize_key,
    normalize_name,
    ratio_to_cap,
    safe_divide,
    year_from_yyyymm,
)


def one_col(spark, rows, schema, expr):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr).collect()]


class TestLinearInterpScore:
    """Parity with _interpolate_score (990.py:736-769): 0 at/above
    healthy, 1 at/below distress (normal direction), linear between."""

    def test_normal_direction(self, spark):
        # healthy=1.5, distress=0.5 (higher is better, e.g. current ratio)
        rows = [(2.0,), (1.5,), (1.0,), (0.5,), (0.0,), (None,)]
        out = one_col(
            spark, rows, "v double", linear_interp_score(F.col("v"), 1.5, 0.5)
        )
        assert out[0] == 0.0  # beyond healthy
        assert out[1] == 0.0  # at healthy
        assert out[2] == pytest.approx(0.5)  # midpoint
        assert out[3] == 1.0  # at distress
        assert out[4] == 1.0  # beyond distress
        assert out[5] is None  # NULL propagates

    def test_inverted_direction(self, spark):
        # healthy=0.3, distress=0.9 (higher is worse, e.g. debt ratio)
        rows = [(0.1,), (0.3,), (0.6,), (0.9,), (1.2,)]
        out = one_col(
            spark,
            rows,
            "v double",
            linear_interp_score(F.col("v"), 0.3, 0.9, invert=True),
        )
        assert out == [0.0, 0.0, pytest.approx(0.5), 1.0, 1.0]


class TestSafeDivide:
    def test_zero_and_null(self, spark):
        rows = [(10.0, 2.0), (10.0, 0.0), (10.0, None), (None, 2.0)]
        out = one_col(
            spark, rows, "a double, b double", safe_divide(F.col("a"), F.col("b"))
        )
        assert out == [5.0, None, None, None]


class TestBucket:
    def test_steps_and_null(self, spark):
        # months-of-reserve style: >=12 -> 0.0, >=6 -> 0.3, >=3 -> 0.6, else 1.0
        edges = [(12, 0.0), (6, 0.3), (3, 0.6)]
        rows = [(15.0,), (12.0,), (7.0,), (3.0,), (1.0,), (None,)]
        out = one_col(spark, rows, "v double", bucket(F.col("v"), edges, 1.0))
        assert out == [0.0, 0.0, 0.3, 0.6, 1.0, None]


class TestHHI:
    def test_null_terms_contribute_zero(self, spark):
        rows = [(0.5, 0.3, 0.2), (0.9, None, 0.1), (None, None, None)]
        out = one_col(
            spark,
            rows,
            "a double, b double, c double",
            hhi([F.col("a"), F.col("b"), F.col("c")]),
        )
        assert out[0] == pytest.approx(0.25 + 0.09 + 0.04)
        assert out[1] == pytest.approx(0.81 + 0.01)
        assert out[2] == 0.0


class TestKeyAndNameNormalization:
    def test_normalize_key(self, spark):
        rows = [("001234567",), (" 42.0 ",), ("0",), (None,), ("9",)]
        out = one_col(spark, rows, "k string", normalize_key(F.col("k")))
        assert out == ["1234567", "42", None, None, "9"]

    def test_normalize_name(self, spark):
        rows = [("  The ACME—Café, Inc. ",), ("A  B\tC",)]
        out = one_col(spark, rows, "n string", normalize_name(F.col("n")))
        assert out == ["the acme caf inc", "a b c"]


class TestMisc:
    def test_flag_parse(self, spark):
        rows = [("Y",), ("yes",), ("1",), ("TRUE",), ("N",), (None,)]
        out = one_col(spark, rows, "f string", flag_parse(F.col("f")))
        assert out == [True, True, True, True, False, False]

    def test_year_from_yyyymm(self, spark):
        out = one_col(spark, [(202312,), (199501,)], "p long", year_from_yyyymm(F.col("p")))
        assert out == [2023, 1995]

    def test_ratio_to_cap_and_clamp(self, spark):
        out = one_col(
            spark, [(0.05,), (0.2,)], "r double", ratio_to_cap(F.col("r"), 0.10)
        )
        assert out == [pytest.approx(0.5), 1.0]
        out = one_col(spark, [(-3.0,), (4.0,)], "v double", clamp_min(F.col("v")))
        assert out == [0.0, 4.0]
        assert math.isfinite(out[1])


def test_format_money(spark):
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.functions.scalar import format_money

    df = spark.createDataFrame(
        [(1.5e9,), (2_400_000.0,), (5_600.0,), (789.0,), (-1_200_000.0,), (None,)],
        "v double",
    )
    got = [r["m"] for r in df.select(format_money(F.col("v")).alias("m")).collect()]
    assert got == ["$1.5B", "$2.4M", "$5.6K", "$789", "-$1.2M", None]


def test_build_predicate_compound(spark):
    from pyspark.sql import Row

    from hummingbirddatapipeline_spark.functions.predicates import build_predicate

    df = spark.createDataFrame(
        [
            Row(id=1, src="990", score=75.0, closed="N", acres=120.0, tier="HIGH"),
            Row(id=2, src="990", score=30.0, closed="N", acres=500.0, tier="LOW"),
            Row(id=3, src="IPEDS", score=90.0, closed="N", acres=50.0, tier="HIGH"),
            Row(id=4, src="990", score=85.0, closed="Y", acres=10.0, tier="HIGH"),
            Row(id=5, src="990", score=85.0, closed="Y", acres=999.0, tier="HIGH"),
        ]
    )
    # the map-panel shape: source contains '990', score >= 40, tier in
    # selection, acreage >= 100 — UNLESS the closed flag is set (the
    # closed-toggle override shows those regardless)
    spec = {
        "src": {"contains": "990"},
        "score": {"gte": 40},
        "tier": {"in": ["HIGH", "CRITICAL"]},
        "acres": {"gte": 100},
        "_unless": {"closed": {"flag": True}},
    }
    got = sorted(r["id"] for r in df.filter(build_predicate(spec)).collect())
    # 1 passes all; 2 fails score/tier; 3 fails source+acres; 4 and 5
    # pass via the closed override
    assert got == [1, 4, 5]


def test_weighted_mean_udaf_matches_expression(spark):
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.functions.udaf import (
        weighted_mean_expr,
        weighted_mean_udaf,
    )

    df = spark.createDataFrame(
        [
            ("a", 10.0, 1.0), ("a", None, 5.0), ("a", 20.0, 3.0),
            ("b", 7.0, 2.0),
            ("c", None, 1.0),  # all-null group -> NULL both paths
        ],
        "g string, v double, w double",
    )
    via_udaf = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(weighted_mean_udaf("v", "w").alias("m"))
        .collect()
    }
    via_expr = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(weighted_mean_expr(F.col("v"), F.col("w")).alias("m"))
        .collect()
    }
    assert via_udaf.keys() == via_expr.keys()
    for g in via_udaf:
        if via_expr[g] is None:
            assert via_udaf[g] is None
        else:
            assert abs(via_udaf[g] - via_expr[g]) < 1e-9
    # hand check: a = (10*1 + 20*3)/4 = 17.5
    assert abs(via_expr["a"] - 17.5) < 1e-9


def test_chunk_token_windows_edges(spark):
    from hummingbirddatapipeline_spark.functions.text import chunk_token_windows

    docs = spark.createDataFrame(
        [
            (1, ""),  # empty -> no chunks
            (2, "   "),  # whitespace only -> no chunks
            (3, "a b c"),  # short -> one chunk
            (4, " ".join(f"t{i}" for i in range(64))),  # exactly chunk -> 1
            (5, " ".join(f"t{i}" for i in range(65))),  # one over -> 2
            (6, " ".join(f"t{i}" for i in range(160))),  # 1+ceil(96/48)=3
        ],
        "doc_id long, text string",
    )
    out = chunk_token_windows(docs, "text", "doc_id", 64, 48)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["n_tokens"] for r in out.collect()
    }
    per_doc = {}
    for (d, _i), n in got.items():
        per_doc.setdefault(d, []).append(n)
    assert 1 not in per_doc and 2 not in per_doc
    assert per_doc[3] == [3]
    assert per_doc[4] == [64]
    assert sorted(per_doc[5], reverse=True) == [64, 17]  # overlap of 48-31
    assert len(per_doc[6]) == 3
    # every chunk except possibly the last is full
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    )
    for d, i, n, txt in rows:
        assert len(txt.split()) == n
    # reconstruction: stride-48 prefix of each chunk tiles the doc
    doc6 = " ".join(f"t{i}" for i in range(160)).split()
    chunks6 = [r[3].split() for r in rows if r[0] == 6]
    rebuilt = chunks6[0][:48] + chunks6[1][:48] + chunks6[2]
    assert rebuilt == doc6


def test_heavy_hitters_sketch_is_exact_at_low_cardinality(spark):
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    got = QUERIES["sketch_topk_heavy_hitters"](spark, sf)
    exact = (
        load(spark, sf, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
    )
    truth = {
        (r["event_type"], r["user_id"]): r["n"] for r in exact.collect()
    }
    for r in got.collect():
        assert truth[(r["event_type"], r["user_id"])] == r["n_events"]


def test_pack_token_bins_invariants(spark):
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.functions.text import (
        chunk_token_windows,
        pack_token_bins,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    chunks = chunk_token_windows(docs, "text", "doc_id", 64, 48).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    packed = pack_token_bins(
        chunks, "source", ["doc_id", "chunk_idx"], "n_tokens", budget=512
    )
    bins = (
        packed.groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    assert bins
    per_source = {}
    for r in bins:
        per_source.setdefault(r["source"], []).append(r["bin_id"])
        # start-offset binning: a bin starts under budget, so it can
        # overflow by at most one chunk (max 64 tokens)
        assert r["tot"] <= 512 + 64
    for src, ids in per_source.items():
        ids = sorted(ids)
        # bins are dense 0..k (no gaps) within each pack group
        assert ids == list(range(len(ids))), src
    # conservation: packed tokens == chunk tokens
    assert (
        packed.agg(F.sum("n_tokens")).first()[0]
        == chunks.agg(F.sum("n_tokens")).first()[0]
    )
