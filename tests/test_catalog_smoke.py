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
