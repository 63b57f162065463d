"""Differential (DuckDB) checks for the 11 operators registered into
the catalog in round 7 (LTTB, Markov transitions, A-ES sampling,
TF-IDF cosine pairs, triangle counts, decayed activity, winsorize,
PSI drift, median impute, radius join, basket co-occurrence).

The oracle SQL lives on the @query registrations now; this suite runs
the SAME compare the driver runs (row count + column names +
order-insensitive exact values) at sf0.001 so a regression in either
side fails CI before the driver sees it."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

R7_QUERIES = [
    "events_lttb_downsample",
    "events_markov_transitions",
    "sample_weighted_aes",
    "dedup_tfidf_cosine_pairs",
    "dedup_triangle_counts",
    "events_decayed_activity",
    "feature_winsorize_prices",
    "feature_psi_price_drift",
    "feature_impute_median_balance",
    "geo_radius_join_suppliers",
    "assoc_basket_cooccurrence",
]


def _harness():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(REPO, "tools", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    return _harness().duck_connect(SF)


@pytest.fixture(scope="module")
def normalize():
    return _harness().normalize


@pytest.mark.parametrize("name", R7_QUERIES)
def test_r7_query_matches_oracle(spark, duck, normalize, name):
    from hummingbirddatapipeline_spark.catalog import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    duck_rows = rel.fetchall()
    assert len(spark_rows) > 0, f"{name}: empty result"
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert normalize(spark_rows, sdf.columns) == normalize(
        duck_rows, list(rel.columns)
    ), name
