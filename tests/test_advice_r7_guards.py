"""Regression tests for the round-6 advisor findings (ADVICE.md):
input-contract guards that previously failed silently now fail loudly,
and the self-loop-only CC node gets its singleton assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import SparkRuntimeException


def test_salted_join_rejects_right_preserving(spark):
    from hummingbirddatapipeline_spark.operators.scale import salted_join

    a = spark.createDataFrame([(1, "x")], ["k", "va"])
    b = spark.createDataFrame([(1, "y"), (2, "z")], ["k", "vb"])
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="skewed-side-preserving"):
            salted_join(a, b, "k", n_salts=4, how=how)
    # the supported modes still work
    assert salted_join(a, b, "k", how="left_anti").count() == 0
    assert salted_join(a, b, "k", how="left_semi").count() == 1


def test_cc_self_loop_only_node_is_singleton(spark):
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (5, 5), (7, 7), (7, 8)], ["id_a", "id_b"]
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    # node 5 appears ONLY in a self edge: it must still get the
    # singleton assignment (5, 5) rather than vanishing
    assert got == {(1, 1), (2, 1), (5, 5), (7, 7), (8, 7)}


def test_minhash_banding_validates_band_split(spark, sf_dir):
    from hummingbirddatapipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(10)
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=32)
    with pytest.raises(ValueError, match="not divisible"):
        minhash_lsh_candidates(sigs, "doc_id", bands=7, num_hashes=32)
    with pytest.raises(ValueError, match="bands <= num_hashes"):
        minhash_lsh_candidates(sigs, "doc_id", bands=64, num_hashes=32)


def test_boilerplate_clusters_validates_band_split(spark, sf_dir):
    from hummingbirddatapipeline_spark.operators.dedup import (
        boilerplate_clusters,
    )
    from hummingbirddatapipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(10)
    with pytest.raises(ValueError, match="not divisible"):
        boilerplate_clusters(docs, "text", "doc_id", num_hashes=32, bands=5)


def test_lttb_rejects_degenerate_n_out(spark):
    from hummingbirddatapipeline_spark.operators.temporal import (
        lttb_downsample,
    )

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)], ["k", "t", "v"]
    )
    for n_out in (0, 1, 2):
        with pytest.raises(ValueError, match="n_out must be >= 3"):
            lttb_downsample(df, "k", "t", "v", n_out)
    assert lttb_downsample(df, "k", "t", "v", 3).count() == 3


def test_radius_join_rejects_out_of_contract_coords(spark):
    from hummingbirddatapipeline_spark.operators.geo import radius_join

    ok_points = spark.createDataFrame(
        [(1, 10.0, 10.0)], ["pid", "lat", "lon"]
    )
    polar_queries = spark.createDataFrame(
        [(1, 75.0, 10.0)], ["qid", "q_lat", "q_lon"]
    )
    with pytest.raises(SparkRuntimeException, match="contract violation"):
        radius_join(ok_points, polar_queries, 5000.0).collect()

    wrap_points = spark.createDataFrame(
        [(1, 10.0, 179.999)], ["pid", "lat", "lon"]
    )
    ok_queries = spark.createDataFrame(
        [(1, 10.0, 10.0)], ["qid", "q_lat", "q_lon"]
    )
    with pytest.raises(SparkRuntimeException, match="contract violation"):
        radius_join(wrap_points, ok_queries, 5000.0).collect()

    with pytest.raises(ValueError, match="radius_m must be > 0"):
        radius_join(ok_points, ok_queries, 0.0)
    with pytest.raises(ValueError, match="too coarse"):
        radius_join(ok_points, ok_queries, 8_000_000.0)

    # in-contract inputs still join
    near_queries = spark.createDataFrame(
        [(1, 10.0001, 10.0001)], ["qid", "q_lat", "q_lon"]
    )
    assert radius_join(ok_points, near_queries, 5000.0).count() == 1
