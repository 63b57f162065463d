"""Smoke: every catalog query runs at sf0.001 with a stable schema,
every oracle key has a matching query, and entry() returns rows."""

from __future__ import annotations


def test_every_query_runs(spark, sf_dir):
    from hummingbirddatapipeline_spark.catalog import QUERIES

    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()  # runs without error


def test_oracle_keys_subset_of_queries():
    from hummingbirddatapipeline_spark.catalog import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.take(1)) == 1


def test_sketches_within_tolerance(spark, sf_dir):
    """Sketch answers must track the exact ones (HLL rsd=2% -> allow
    5%; t-digest accuracy=10k is near-exact at this scale)."""
    from pyspark.sql import functions as F

    from hummingbirddatapipeline_spark.catalog import QUERIES
    from hummingbirddatapipeline_spark.tables import load

    ev = load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["sketch_approx_distinct_users"](spark, sf_dir).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.05, (et, n, approx[et])

    med = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    sk = {
        r["event_type"]: r["p50"]
        for r in QUERIES["sketch_value_quantiles"](spark, sf_dir).collect()
    }
    for et, m in med.items():
        assert abs(sk[et] - m) <= max(0.05 * abs(m), 0.05), (et, m, sk[et])
