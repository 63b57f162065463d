"""Scale-path operator tests: salted skew join equivalence and
bucketed co-located joins (shuffle elision verified from the physical
plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_salted_join_equivalent_to_plain(spark):
    # heavy skew: 10k rows on one key, a handful elsewhere
    skewed = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    ).union(
        spark.range(5).select((F.col("id") + 2).alias("k"), F.col("id").alias("payload"))
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (99, "unused")], "k int, label string"
    )
    plain = skewed.join(small, "k")
    salted = salted_join(skewed, small, "k", n_salts=8)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, plain.select("k", "payload", "label").collect()))
    b = sorted(map(tuple, salted.select("k", "payload", "label").collect()))
    assert a == b
    # hot key's rows actually spread across multiple salt partitions
    spread = (
        skewed.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8)),
        )
        .filter("k = 1")
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread > 1


def test_salted_left_join_keeps_unmatched(spark):
    skewed = spark.createDataFrame([(1, 1), (42, 2)], "k int, payload int")
    small = spark.createDataFrame([(1, "x")], "k int, label string")
    out = salted_join(skewed, small, "k", n_salts=4, how="left")
    got = {r["payload"]: r["label"] for r in out.collect()}
    assert got == {1: "x", 2: None}


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bucket_left", "k", n_buckets=4)
    write_bucketed(right, "t_bucket_right", "k", n_buckets=4)
    joined = bucketed_join(spark, "t_bucket_left", "t_bucket_right", "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located layout: the join runs without any shuffle exchange
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() == 1000
    spark.sql("DROP TABLE t_bucket_left")
    spark.sql("DROP TABLE t_bucket_right")


def test_zorder_layout_tightens_minmax_ranges(spark, sf_dir):
    """Z-ordering must shrink per-file min/max ranges in BOTH
    dimensions vs a single-column sort (the data-skipping win)."""
    from hummingbirddatapipeline_spark.operators.scale import zorder_layout
    from hummingbirddatapipeline_spark.tables import load

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n_parts = 16

    def span_sum(df, col):
        parts = df.withColumn("p", F.spark_partition_id()).groupBy("p").agg(
            (F.max(col) - F.min(col)).alias("span")
        )
        return sum(r["span"] for r in parts.collect())

    z = zorder_layout(orders, "o_custkey", "o_orderkey", n_files=n_parts)
    by_key = orders.repartitionByRange(n_parts, "o_orderkey")
    # single-column layout: orderkey ranges tight but custkey ranges ~full
    assert span_sum(z, "o_custkey") < 0.5 * span_sum(by_key, "o_custkey")
    # and z-order keeps orderkey ranges far below the unclustered worst case
    full_span = orders.agg(
        (F.max("o_orderkey") - F.min("o_orderkey")).alias("s")
    ).first()["s"]
    assert span_sum(z, "o_orderkey") < n_parts * full_span * 0.6


def test_morton_code_interleaves(spark):
    from hummingbirddatapipeline_spark.operators.scale import morton_code

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(morton_code(F.col("a"), F.col("b")).alias("z")).first()["z"]
    # a bits at even positions: 1,0,1 -> 0b010001; b bits odd: 1,1,0 -> 0b001010
    assert got == 0b011011


def test_expectations_detect_violations(spark):
    from hummingbirddatapipeline_spark.operators.expectations import (
        check_expectations,
        check_foreign_key,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, amount double"
    )
    out = {r["check_name"]: r for r in check_expectations(
        df,
        {
            "amount_positive": F.col("amount").isNull() | (F.col("amount") <= 0),
            "id_not_null": F.col("id").isNull(),
        },
    ).collect()}
    assert out["amount_positive"]["n_violations"] == 2
    assert not out["amount_positive"]["passed"]
    assert out["id_not_null"]["passed"]

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (9,), (None,)], "fk long")
    fk = check_foreign_key(child, parent, "fk", "k").first()
    assert fk["n_violations"] == 1 and not fk["passed"]  # NULL keys skip


def test_merge_rollups_equals_full_rollup(spark):
    from hummingbirddatapipeline_spark.operators.incremental import merge_rollups

    rows = [(i % 3, i, i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, id long, cents long")

    def roll(d):
        return d.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("cents").alias("cents")
        )

    full = {r["k"]: (r["n"], r["cents"]) for r in roll(df).collect()}
    merged = merge_rollups(
        roll(df.filter("id < 20")),
        roll(df.filter("id >= 20")),
        keys=("k",),
        count_cols=("n",),
        sum_cols=("cents",),
    )
    got = {r["k"]: (r["n"], r["cents"]) for r in merged.collect()}
    assert got == full


def test_key_skew_report_hand_computed(spark):
    from hummingbirddatapipeline_spark.operators.scale import key_skew_report

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_k=2).collect()
    assert [r["key"] for r in out] == ["a", "b"]
    a, b = out
    # n_rows=10, n_keys=4, avg=2.5
    assert a["cnt"] == 6 and a["share"] == 0.6 and a["n_keys"] == 4
    assert a["skew_ratio"] == 2.4
    assert a["suggested_salt"] == 3  # ceil(6 / 2.5)
    assert b["suggested_salt"] == 1  # ceil(0.8) but floored at 1
    assert a["rank"] == 1 and b["rank"] == 2


def test_key_skew_report_tie_breaks_by_key(spark):
    from hummingbirddatapipeline_spark.operators.scale import key_skew_report

    df = spark.createDataFrame([("z",), ("y",), ("x",)], "k string")
    out = key_skew_report(df, "k", top_k=3).collect()
    assert [r["key"] for r in out] == ["x", "y", "z"]


def test_winsorize_clips_outliers(spark):
    from hummingbirddatapipeline_spark.operators.scale import winsorize

    rows = [(1, float(v)) for v in range(1, 100)] + [(1, 10_000.0)]
    df = spark.createDataFrame(rows, "g int, v double")
    out = winsorize(df, "v", "g", lower=0.0, upper=0.95).collect()
    top = max(r["v_winsorized"] for r in out)
    # p95 over 100 points interpolates at rank 94.05 -> 95.05
    assert top == 95.05
    assert all(r["v_winsorized"] <= r["p_hi"] for r in out)
    assert min(r["v_winsorized"] for r in out) == 1.0


def test_psi_identical_distributions_near_zero(spark):
    from hummingbirddatapipeline_spark.operators.scale import psi_drift

    df = spark.range(1000).selectExpr("CAST(id % 97 AS DOUBLE) AS v")
    out = psi_drift(df, df, "v").collect()
    assert len(out) == 10
    assert all(r["psi_total"] == out[0]["psi_total"] for r in out)
    assert abs(out[0]["psi_total"]) < 1e-9  # same sample -> zero drift


def test_psi_shifted_distribution_flags_drift(spark):
    from hummingbirddatapipeline_spark.operators.scale import psi_drift

    ref = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    cur = spark.range(1000).selectExpr(
        "CAST(id % 100 AS DOUBLE) + 60.0 AS v"
    )
    out = psi_drift(ref, cur, "v").collect()
    assert out[0]["psi_total"] > 0.25  # rule-of-thumb "shifted"
    # top bucket gained mass, bottom buckets lost it
    by_b = {r["bucket"]: r for r in out}
    assert by_b[9]["cur_frac"] > by_b[9]["ref_frac"]
    assert by_b[0]["cur_frac"] < by_b[0]["ref_frac"]


def test_impute_median_fills_nulls_per_group(spark):
    from hummingbirddatapipeline_spark.operators.scale import impute_median

    rows = [
        ("a", 1.0), ("a", 3.0), ("a", None),
        ("b", 10.0), ("b", None),
        ("c", None),  # all-NULL group stays NULL
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = impute_median(df, "v", "g").collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], []).append(r)
    a_filled = [r for r in by["a"] if r["v_was_null"]]
    assert a_filled[0]["v_imputed"] == 2.0  # median of 1, 3
    b_filled = [r for r in by["b"] if r["v_was_null"]]
    assert b_filled[0]["v_imputed"] == 10.0
    c = by["c"][0]
    assert c["v_imputed"] is None and c["v_was_null"]
    # non-null rows unchanged
    assert all(r["v_imputed"] == r["v"] for r in out if not r["v_was_null"])


def test_psi_empty_reference_raises(spark):
    """An empty (or all-NULL) reference has no deciles; PSI must fail
    loudly instead of emitting the clamped 1e-6-everywhere report that
    looks like a valid drift score (found via the r7 profile work: the
    original catalog split date left the reference empty at every SF
    and the degenerate output still oracle-matched)."""
    import pytest

    from hummingbirddatapipeline_spark.operators.scale import psi_drift

    cur = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS v")
    empty = cur.filter("v < 0")
    # the raise may surface as SparkRuntimeException or a Py4J wrapper
    # depending on which thread (broadcast exchange) evaluates it
    with pytest.raises(Exception, match="reference sample is empty"):
        psi_drift(empty, cur, "v").collect()
    all_null = cur.selectExpr("CAST(NULL AS DOUBLE) AS v")
    with pytest.raises(Exception, match="reference sample is empty"):
        psi_drift(all_null, cur, "v").collect()


def test_histogram_quantile_error_fine_bins_near_exact(spark):
    """With bins >> distinct values (1..1000 into 4096 bins) the
    histogram estimate must sit within a couple of rank units of the
    true quantile, estimates must be monotone in q, and the rank-error
    metric itself must read small."""
    from hummingbirddatapipeline_spark.operators.scale import (
        histogram_quantile_error,
    )

    df = spark.range(1, 1001).select(F.col("id").alias("cents"))
    rows = {
        r["q_e6"]: r
        for r in histogram_quantile_error(df, "cents").collect()
    }
    assert set(rows) == {500000, 900000, 990000}
    for q, r in rows.items():
        exact = q // 1000  # value at rank ceil(q/1e6 * 1000) is q/1000
        assert abs(r["est_value"] - exact) <= 2, (q, r)
        assert r["rank_err_e6"] <= 5000, (q, r)  # <= 0.5% rank error
    ests = [rows[q]["est_value"] for q in sorted(rows)]
    assert ests == sorted(ests)


def test_histogram_quantile_error_constant_column(spark):
    """Degenerate single-value column: the estimate must be the value
    itself (the only possible quantile), n_below must be 0, and the
    report must still emit one row per requested quantile — the
    count-below rank convention reads the lower bound of the tie run,
    so rank_err_e6 equals q_e6 here by definition."""
    from hummingbirddatapipeline_spark.operators.scale import (
        histogram_quantile_error,
    )

    df = spark.range(500).select(F.lit(77).cast("long").alias("cents"))
    rows = histogram_quantile_error(df, "cents").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["est_value"] == 77
        assert r["n_below"] == 0
        assert r["rank_err_e6"] == r["q_e6"]
